"""Non-blocking device->host readback.

Parity with the reference's double-buffered ``AsyncScalarReader``
(src/solver/gpu/async_buffer.rs:11-248), which overlaps convergence readbacks
with GPU work.  JAX arrays are already asynchronous futures; this wrapper
adds the same start/poll/get-last-value protocol on top of
``copy_to_host_async`` so host loops can inspect diagnostics without
stalling the device — the host-driven outer loop (models/coupled.step_host)
is the main consumer pattern.

Note the fused scan path needs none of this: convergence lives on device
(SURVEY.md §5 maps the async-reader pattern to "carry residuals in the
scan").
"""

from __future__ import annotations

import numpy as np


class AsyncFieldReader:
    """start_read / poll / get_last_value over device arrays."""

    def __init__(self, depth: int = 2):
        self._pending: list = []
        self._last = None
        self._depth = depth

    def start_read(self, device_array) -> None:
        """Begin an async copy of ``device_array`` to the host."""
        try:
            device_array.copy_to_host_async()
        except AttributeError:
            pass   # backend without async copies: np.asarray below still works
        self._pending.append(device_array)
        # Bounded queue like the reference's two staging buffers
        # (async_buffer.rs:75-79): blocking-drain the oldest when full.
        while len(self._pending) > self._depth:
            self._last = np.asarray(self._pending.pop(0))

    def poll(self) -> bool:
        """Harvest any finished reads; returns True if a new value landed."""
        got = False
        still = []
        for arr in self._pending:
            if getattr(arr, "is_ready", lambda: True)():
                self._last = np.asarray(arr)
                got = True
            else:
                still.append(arr)
        self._pending = still
        return got

    def get_last_value(self):
        """Most recent completed value (None until the first read lands)."""
        return self._last

    def flush(self):
        """Blocking drain of all pending reads (async_buffer.rs flush)."""
        for arr in self._pending:
            self._last = np.asarray(arr)
        self._pending = []
        return self._last

    def reset(self):
        self._pending = []
        self._last = None
