"""ctypes bindings for the native ingest server + load generator.

The C++ library (fleetrec_tpu/native/ingest.cpp) is the analog of the
reference GPU server's socket tier (cuda_server.c) and sender emulators
(FPGA0_/CPU0_*_client_sender.c); this wrapper exposes batches as numpy
views over the ring slots, zero-copy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfleetrec_ingest.so")


def build_native(force: bool = False) -> str:
    """Compile the shared library if needed (g++ is in the image)."""
    src = os.path.join(_NATIVE_DIR, "ingest.cpp")
    if force or not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB_PATH


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_native())
        lib.ing_create.restype = ctypes.c_void_p
        lib.ing_create.argtypes = [ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
                                   ctypes.c_int, ctypes.c_int]
        lib.ing_listen.restype = ctypes.c_int
        lib.ing_listen.argtypes = [ctypes.c_void_p]
        lib.ing_start.argtypes = [ctypes.c_void_p]
        lib.ing_acquire.restype = ctypes.c_int
        lib.ing_acquire.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ing_slot_data.restype = ctypes.POINTER(ctypes.c_float)
        lib.ing_slot_data.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ing_slot_first_byte_ns.restype = ctypes.c_int64
        lib.ing_slot_first_byte_ns.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ing_slot_complete_ns.restype = ctypes.c_int64
        lib.ing_slot_complete_ns.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ing_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ing_reply.restype = ctypes.c_int
        lib.ing_reply.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.c_void_p, ctypes.c_int64]
        lib.ing_total_batches.restype = ctypes.c_int64
        lib.ing_total_batches.argtypes = [ctypes.c_void_p]
        lib.ing_bytes_received.restype = ctypes.c_int64
        lib.ing_bytes_received.argtypes = [ctypes.c_void_p]
        lib.ing_error.restype = ctypes.c_int
        lib.ing_error.argtypes = [ctypes.c_void_p]
        lib.ing_stop.argtypes = [ctypes.c_void_p]
        lib.ing_destroy.argtypes = [ctypes.c_void_p]
        lib.loadgen_run.restype = ctypes.c_int64
        lib.loadgen_run.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_float]
        _lib = lib
    return _lib


class IngestServer:
    """N-sender fixed-offset batch assembler.

    bytes_per_sender: each sender's per-batch payload (e.g. model-3:
    [64*4, 1952*4, 1952*4] floats*batch — constant.h:25-27)."""

    def __init__(self, bytes_per_sender: Sequence[int], n_slots: int = 8,
                 port_base: int = 7080):
        lib = _load()
        self._lib = lib
        arr = (ctypes.c_int64 * len(bytes_per_sender))(*bytes_per_sender)
        self._h = lib.ing_create(len(bytes_per_sender), arr, n_slots, port_base)
        self.n_senders = len(bytes_per_sender)
        self.slot_floats = sum(bytes_per_sender) // 4
        self.port_base = port_base
        rc = lib.ing_listen(self._h)
        if rc != 0:
            raise OSError(-rc, f"ingest listen failed: {os.strerror(-rc)}")
        lib.ing_start(self._h)

    def acquire(self, timeout_ms: int = 10_000):
        """Block for the next complete batch. Returns (slot, view, t_first_ns,
        t_complete_ns) or None on timeout. view is a zero-copy float32
        numpy array over the slot — valid until release(slot)."""
        slot = self._lib.ing_acquire(self._h, timeout_ms)
        if slot < 0:
            return None
        ptr = self._lib.ing_slot_data(self._h, slot)
        view = np.ctypeslib.as_array(ptr, shape=(self.slot_floats,))
        return (
            slot,
            view,
            self._lib.ing_slot_first_byte_ns(self._h, slot),
            self._lib.ing_slot_complete_ns(self._h, slot),
        )

    def release(self, slot: int):
        self._lib.ing_release(self._h, slot)

    def reply(self, sender: int, arr: np.ndarray) -> None:
        """Send bytes back on sender's live connection (scores egress —
        TCP is full-duplex). Raises if the sender is disconnected or the
        send fails; the client MUST read replies or backpressure stalls."""
        arr = np.ascontiguousarray(arr)
        rc = self._lib.ing_reply(
            self._h, sender, arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes
        )
        if rc != 0:
            raise OSError(-rc, f"ingest reply failed: {os.strerror(-rc)}")

    @property
    def total_batches(self) -> int:
        return self._lib.ing_total_batches(self._h)

    @property
    def bytes_received(self) -> int:
        return self._lib.ing_bytes_received(self._h)

    def close(self):
        if self._h:
            self._lib.ing_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Loadgen:
    """Threaded senders, one per port — the reference sender emulators."""

    def __init__(self, ip: str, port_base: int, bytes_per_sender: Sequence[int],
                 n_batches: int, fill: float = 1.0):
        self._lib = _load()
        self.results: List[Optional[int]] = [None] * len(bytes_per_sender)
        self.threads = []
        for s, nbytes in enumerate(bytes_per_sender):
            t = threading.Thread(
                target=self._run, args=(s, ip, port_base + s, nbytes, n_batches, fill),
                daemon=True,
            )
            self.threads.append(t)

    def _run(self, s, ip, port, nbytes, n_batches, fill):
        self.results[s] = self._lib.loadgen_run(
            ip.encode(), port, nbytes, n_batches, fill
        )

    def start(self):
        for t in self.threads:
            t.start()
        return self

    def join(self, timeout: Optional[float] = None):
        for t in self.threads:
            t.join(timeout)
        return self.results
