"""ctypes bindings + on-demand build of the native runtime library.

The compute path is JAX/XLA/Pallas; this module carries the host-side C++
runtime equivalents of the reference's native layers (see fpnative.cpp).
Everything degrades gracefully to the pure-Python implementations when no
C++ toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_HERE = pathlib.Path(__file__).parent
_LIB_PATH = _HERE / "libfpnative.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


class _FpMesh(ctypes.Structure):
    _fields_ = [
        ("positions", ctypes.POINTER(ctypes.c_float)),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("uvs", ctypes.POINTER(ctypes.c_float)),
        ("faces", ctypes.POINTER(ctypes.c_int32)),
        ("num_vertices", ctypes.c_int64),
        ("num_faces", ctypes.c_int64),
        ("has_normals", ctypes.c_int32),
        ("has_uvs", ctypes.c_int32),
        ("texture_path", ctypes.c_char * 1024),
    ]


def _build() -> bool:
    src = _HERE / "fpnative.cpp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
        "-pthread", str(src), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_library() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _LIB_PATH.exists() or (
            _LIB_PATH.stat().st_mtime < (_HERE / "fpnative.cpp").stat().st_mtime
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _build_failed = True
            return None
        lib.fp_parse_obj.restype = ctypes.POINTER(_FpMesh)
        lib.fp_parse_obj.argtypes = [ctypes.c_char_p]
        lib.fp_parse_ply.restype = ctypes.POINTER(_FpMesh)
        lib.fp_parse_ply.argtypes = [ctypes.c_char_p]
        lib.fp_free_mesh.argtypes = [ctypes.POINTER(_FpMesh)]
        lib.fp_mesh_diameter.restype = ctypes.c_double
        lib.fp_mesh_diameter.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.fp_diameter_exact.restype = ctypes.c_double
        lib.fp_diameter_exact.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.fp_ring_create.restype = ctypes.c_void_p
        lib.fp_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.fp_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.fp_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.fp_ring_pop_latest.restype = ctypes.c_int64
        lib.fp_ring_pop_latest.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.fp_ring_size.restype = ctypes.c_int64
        lib.fp_ring_size.argtypes = [ctypes.c_void_p]
        lib.fp_ring_dropped.restype = ctypes.c_int64
        lib.fp_ring_dropped.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def parse_obj_native(path: str):
    """Parse an OBJ with the C++ parser.

    Returns (positions (V,3), uvs (V,2)|None, normals (V,3)|None,
    faces (F,3), texture_path|None) or None if unavailable/failed.
    """
    return _parse_native(path, "fp_parse_obj")


def parse_ply_native(path: str):
    """Parse an ascii/binary_little_endian PLY with the C++ parser.

    Same return contract as parse_obj_native; None on unsupported shapes
    (big-endian, list-typed vertex properties) so the caller can fall back
    to the Python parser."""
    return _parse_native(path, "fp_parse_ply")


def _parse_native(path: str, fn_name: str):
    lib = load_library()
    if lib is None:
        return None
    mp = getattr(lib, fn_name)(os.fsencode(str(path)))
    if not mp:
        return None
    try:
        m = mp.contents
        v, f = int(m.num_vertices), int(m.num_faces)
        pos = np.ctypeslib.as_array(m.positions, shape=(v, 3)).copy()
        nrm = (
            np.ctypeslib.as_array(m.normals, shape=(v, 3)).copy()
            if m.has_normals else None
        )
        uv = (
            np.ctypeslib.as_array(m.uvs, shape=(v, 2)).copy()
            if m.has_uvs else None
        )
        faces = np.ctypeslib.as_array(m.faces, shape=(f, 3)).copy()
        tex = m.texture_path.decode() or None
        return pos, uv, nrm, faces, tex
    finally:
        lib.fp_free_mesh(mp)


def mesh_diameter_native(positions: np.ndarray) -> float | None:
    lib = load_library()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, dtype=np.float32)
    return float(
        lib.fp_mesh_diameter(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pos.shape[0]
        )
    )


def diameter_exact_native(positions: np.ndarray) -> float | None:
    """Exact threaded pairwise-max distance (fp_diameter_exact).

    Callers pass convex-hull vertices; the hull's farthest pair equals the
    full set's. None when the native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, dtype=np.float32)
    return float(
        lib.fp_diameter_exact(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pos.shape[0]
        )
    )


class FrameRing:
    """SPSC drop-oldest frame queue backed by the C++ ring.

    The async-tracking feeder: a capture thread pushes frames; the TPU loop
    pops the newest, skipping stale frames (real-time tracking policy).
    """

    def __init__(self, frame_shape: tuple, dtype=np.uint8, capacity: int = 4):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._shape = tuple(frame_shape)
        self._dtype = np.dtype(dtype)
        self._bytes = int(np.prod(self._shape)) * self._dtype.itemsize
        self._ring = lib.fp_ring_create(self._bytes, capacity)
        if not self._ring:
            # the native side rejects capacity/frame_bytes <= 0 (a zero
            # capacity would SIGFPE on the first push) and alloc failure
            raise ValueError(
                f"fp_ring_create failed (frame_bytes={self._bytes}, "
                f"capacity={capacity}); both must be positive"
            )

    def push(self, frame: np.ndarray) -> None:
        buf = np.ascontiguousarray(frame, dtype=self._dtype)
        assert buf.nbytes == self._bytes, (buf.shape, self._shape)
        self._lib.fp_ring_push(self._ring, buf.ctypes.data_as(ctypes.c_char_p))

    def pop_latest(self) -> tuple[np.ndarray, int] | None:
        """Newest frame + number of stale frames skipped, or None if empty."""
        out = np.empty(self._shape, dtype=self._dtype)
        skipped = self._lib.fp_ring_pop_latest(
            self._ring, out.ctypes.data_as(ctypes.c_char_p)
        )
        if skipped < 0:
            return None
        return out, int(skipped)

    def __len__(self) -> int:
        return int(self._lib.fp_ring_size(self._ring))

    @property
    def dropped(self) -> int:
        return int(self._lib.fp_ring_dropped(self._ring))

    def close(self) -> None:
        if self._ring:
            self._lib.fp_ring_destroy(self._ring)
            self._ring = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
