"""Advisory single-process TPU lock.

Only one client can use the axon-tunneled chip at a time; a second silently
blocks, and killing a blocked client can wedge the tunnel (CLAUDE.md). This
lockfile lets tools distinguish "chip busy: another local job holds it" from
"tunnel wedged: nobody holds it but backend init hangs" before deciding to
fail fast. Advisory only - nothing enforces it - but every long-running TPU
entry point in this repo acquires it.
"""

import os

LOCK_PATH = os.environ.get("T3DGS_TPU_LOCK", "/tmp/t3dgs_tpu.lock")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def holder() -> int:
    """PID of the live process holding the lock, or 0 if free/stale."""
    try:
        with open(LOCK_PATH) as f:
            pid = int(f.read().strip() or "0")
    except (FileNotFoundError, ValueError):
        return 0
    return pid if pid and _pid_alive(pid) else 0


def acquire() -> bool:
    """Record this process as the chip user. Returns False (without
    overwriting) if another live process already holds the lock."""
    h = holder()
    if h and h != os.getpid():
        return False
    with open(LOCK_PATH, "w") as f:
        f.write(str(os.getpid()))
    return True


def release() -> None:
    if holder() == os.getpid():
        try:
            os.remove(LOCK_PATH)
        except FileNotFoundError:
            pass
