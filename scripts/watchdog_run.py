"""Run a TPU command under a log-progress watchdog (internal tool).

The shared-TPU tunnel in this container occasionally wedges: the worker
stops responding and the client blocks forever inside an XLA execution
(r3j post-mortem: stage-1 epoch cadence ~30 s, then 50+ min of silence
with 0 CPU).  ``timeout`` alone is tuned to total runtime, not progress,
so a wedge at epoch 84/100 burns the whole budget.  This wrapper kills
the child when its LOG stops growing for STALL seconds and exits 99 so
the caller can resume from the last checkpoint (`--continue_training`).

Usage: python scripts/watchdog_run.py LOG STALL_SECS -- CMD [ARGS...]
Exit: child's code if it finishes; 99 on a stall kill.
"""

import os
import signal
import subprocess
import sys
import time

STALL_EXIT = 99


def main() -> int:
    log_path, stall_secs = sys.argv[1], float(sys.argv[2])
    assert sys.argv[3] == "--", "usage: watchdog_run.py LOG STALL -- CMD..."
    cmd = sys.argv[4:]

    log = open(log_path, "ab", buffering=0)
    child = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT, start_new_session=True)
    last_size, last_change = -1, time.time()
    try:
        while True:
            rc = child.poll()
            if rc is not None:
                return rc
            size = os.path.getsize(log_path)
            if size != last_size:
                last_size, last_change = size, time.time()
            elif time.time() - last_change > stall_secs:
                print(f"[watchdog] no log growth in {stall_secs:.0f}s; killing pgid {child.pid}", flush=True)
                os.killpg(child.pid, signal.SIGKILL)
                child.wait()
                return STALL_EXIT
            time.sleep(15)
    finally:
        log.close()


if __name__ == "__main__":
    sys.exit(main())
