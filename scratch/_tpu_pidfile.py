"""Advertise this process as the current TPU client via a pidfile.

The axon runtime serves ONE client; a second concurrent client hangs
(and hard-killing either wedges the device claim for 20-65 min).  Chain
steps (A/Bs, north-star) register themselves here so bench.py can
preempt them with SIGINT — the one safe kill on this platform (python
cleans up and releases the claim; the north-star run is window-
checkpointed, so an interrupt costs only the current window).

The file holds ``pid starttime`` (starttime from /proc/<pid>/stat,
field 22) so a stale file whose pid the kernel has recycled is never
mistaken for a live client — liveness checks must compare both.
"""

import atexit
import os

PATH = "/tmp/tpu_client.pid"


def _stat_fields(pid):
    try:
        with open(f"/proc/{pid}/stat") as f:
            # field 2 (comm) may contain spaces; split after the ')'
            return f.read().rsplit(")", 1)[1].split()
    except (OSError, IndexError):
        return None


def proc_starttime(pid):
    """Kernel start time (clock ticks) of ``pid``, or None if gone.

    A zombie (exited but unreaped — it still accepts signals) counts
    as gone: its claim on the device is already released.
    """
    fields = _stat_fields(pid)
    if fields is None or fields[0] == "Z":
        return None
    try:
        return int(fields[19])
    except (IndexError, ValueError):
        return None


def register():
    me = os.getpid()
    with open(PATH, "w") as f:
        f.write(f"{me} {proc_starttime(me)}")

    def _cleanup():
        try:
            with open(PATH) as f:
                if int(f.read().split()[0]) == me:
                    os.unlink(PATH)
        except (OSError, ValueError, IndexError):
            pass

    atexit.register(_cleanup)


def read():
    """(pid, starttime) from the pidfile, or None if absent/garbled.

    ``starttime`` is None for legacy single-field files.
    """
    try:
        with open(PATH) as f:
            parts = f.read().split()
        pid = int(parts[0])
        start = int(parts[1]) if len(parts) > 1 else None
        return pid, start
    except (OSError, ValueError, IndexError):
        return None


def holder_alive():
    """True iff the pidfile names a live, identity-verified client."""
    info = read()
    if info is None:
        return False
    pid, start = info
    now = proc_starttime(pid)
    if now is None:
        return False
    return start is None or now == start
