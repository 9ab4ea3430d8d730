#!/usr/bin/env python
"""drift-runpipeline: run the timestream pipeline from a YAML config.

Functional parity with /root/reference/drift/scripts/runpipeline.py.
"""

import os.path

import click

manager = None


@click.group()
def cli():
    """Run a data-analysis pipeline on simulated or real timestreams."""


@cli.command("run-config")
@click.argument(
    "configfile",
    type=click.Path(exists=True, dir_okay=False, readable=True, resolve_path=True),
)
def run_config(configfile):
    """Run the pipeline from CONFIGFILE."""
    from ..pipeline import pipeline

    pm = pipeline.PipelineManager.from_configfile(configfile)
    pm.simulate()
    pm.generate()


@cli.command("interactive-config")
@click.argument(
    "configfile",
    type=click.Path(exists=True, dir_okay=False, readable=True, resolve_path=True),
)
def interactive_config(configfile):
    """Load the pipeline config without running it (exposes `manager`)."""
    from ..pipeline import pipeline

    global manager
    manager = pipeline.PipelineManager.from_configfile(configfile)
    print("*** Access the pipeline through the global variable `manager` ***")


@cli.command("queue-config")
@click.argument(
    "configfile",
    type=click.Path(exists=True, dir_okay=False, readable=True, resolve_path=True),
)
@click.option("--submit/--nosubmit", default=True)
def queue_config(configfile, submit):
    """Queue a pipeline run as a batch job."""
    import yaml

    with open(configfile, "r") as f:
        yconf = yaml.safe_load(f)

    conf = yconf["config"]
    outdir = os.path.normpath(
        os.path.expandvars(os.path.expanduser(conf["timestream_directory"]))
    )
    if not os.path.isabs(outdir):
        raise Exception("Output directory path must be absolute.")

    submitdir = outdir + "/queue/"
    if not os.path.exists(submitdir):
        os.makedirs(submitdir)

    import shutil

    dfile = submitdir + "/config.yaml"
    if os.path.realpath(configfile) != os.path.realpath(dfile):
        shutil.copy(configfile, dfile)

    script = (
        "#!/bin/bash\ncd %s\n"
        "python -m driftscan_tpu.scripts.runpipeline run-config %s &> %s\n"
        % (outdir, dfile, submitdir + "/jobout.log")
    )
    with open(submitdir + "/jobscript.sh", "w") as f:
        f.write(script)

    if submit:
        os.system("cd %s; bash jobscript.sh" % submitdir)


if __name__ == "__main__":
    cli()
