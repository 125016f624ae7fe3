"""Process-wide device-work serialization.

The single-chip TPU relay this container sees (the axon PJRT tunnel) is not
robust under concurrent dispatch from multiple host threads: the overlapped
frontend (extraction + matching threads), the shape-prewarm daemon, and the
mapper each issuing programs can wedge an execution that never returns
(observed: mid-run hang at 0% host CPU, main thread parked in nanosleep,
nondeterministic trigger point). All device-touching sections therefore
serialize on one process-wide RLock.

Cost analysis: the chip is a single serial resource regardless — XLA executes
one program at a time per core — so the lock forfeits only host/device
overlap inside locked sections, and MFU here is <<1% (host-bound pipeline).
On an uncontended path the RLock costs ~100 ns per section. RLock (not Lock)
so nested device sections within one thread are fine.

Usage:
    from ..utils import device_lock

    with device_lock.LOCK:
        out = some_jitted_fn(...)
        vals = jax.device_get(out)   # keep readback inside the section

or decorate a whole device-phase method with @device_lock.locked.
"""

from __future__ import annotations

import functools
import threading

LOCK = threading.RLock()


def locked(fn):
    """Run the wrapped callable while holding the process device lock."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with LOCK:
            return fn(*args, **kwargs)

    return wrapper
