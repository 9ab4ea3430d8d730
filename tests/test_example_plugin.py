"""Plugin class loading through the YAML `type: {module, class, file}` spec,
exercised with the shipped example telescope (examples/disharray/
simplearray.py) — reference mechanism at
/root/reference/drift/core/manager.py:54-80."""

import os

import numpy as np

from driftscan_tpu.core import manager

EXAMPLE = os.path.join(
    os.path.dirname(__file__), "..", "examples", "disharray", "simplearray.py"
)


def test_plugin_telescope_loads_and_generates(tmp_path):
    conf = {
        "config": {
            "beamtransfers": True,
            "kltransform": False,
            "psfisher": False,
            "output_directory": str(tmp_path / "prod"),
            "nosvd": True,
        },
        "telescope": {
            "type": {
                "file": os.path.abspath(EXAMPLE),
                "module": "simplearray",
                "class": "GridDishArray",
            },
            "num_freq": 2,
            "freq_start": 100.0,
            "freq_end": 102.0,
            "gridu": 2,
            "gridv": 2,
            "dish_width": 1.5,
        },
    }

    m = manager.ProductManager()
    m.apply_config(conf)

    tel = m.telescope
    assert type(tel).__name__ == "GridDishArray"
    # 2x2 grid of dual-pol feeds
    assert tel.feedpositions.shape == (8, 2)
    assert tel.gridu == 2 and tel.dish_width == 1.5

    m.generate()
    beam = tel.transfer_matrices(np.array([0]), np.array([0]))
    assert np.isfinite(beam).all()
    assert np.abs(beam).max() > 0


def test_unknown_plugin_module_errors(tmp_path):
    conf = {
        "config": {
            "beamtransfers": False,
            "output_directory": str(tmp_path / "prod"),
        },
        "telescope": {"type": {"module": "no_such_module", "class": "X"}},
    }
    m = manager.ProductManager()
    try:
        m.apply_config(conf)
    except (ImportError, ModuleNotFoundError):
        return
    raise AssertionError("expected an import error")
