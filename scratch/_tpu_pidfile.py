"""Advertise this process as the current TPU client via a pidfile.

The axon runtime serves ONE client; a second concurrent client hangs
(and hard-killing either wedges the device claim for 20-65 min).  Chain
steps (A/Bs, north-star) register themselves here so bench.py can
preempt them with SIGINT — the one safe kill on this platform (python
cleans up and releases the claim; the north-star run is window-
checkpointed, so an interrupt costs only the current window).
"""

import atexit
import os

PATH = "/tmp/tpu_client.pid"


def register():
    with open(PATH, "w") as f:
        f.write(str(os.getpid()))

    def _cleanup():
        try:
            with open(PATH) as f:
                if int(f.read().strip()) == os.getpid():
                    os.unlink(PATH)
        except (OSError, ValueError):
            pass

    atexit.register(_cleanup)
