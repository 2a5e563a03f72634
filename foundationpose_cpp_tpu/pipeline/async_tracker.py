"""Real-time async tracking session: capture thread -> frame ring -> TPU loop.

The reference's EasyDeployTool provides an async_pipeline with
IPipelinePackage handoffs between stages (SURVEY.md SS2.8); its tests drive
Track frame-by-frame synchronously. This module is the deployment-shaped
equivalent for the TPU pipeline: a producer (camera / dataset reader) pushes
RGB-D frames into the native SPSC ring (C++, drop-oldest), and the tracking
loop consumes the NEWEST frame each iteration -- when the estimator is
slower than the camera it skips stale frames instead of lagging, and the
`dropped`/`skipped` counters expose the real-time behavior.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Callable, Iterable

import numpy as np

from foundationpose_cpp_tpu.pipeline.foundationpose import FoundationPose


@dataclasses.dataclass
class TrackRecord:
    frame_index: int
    pose: np.ndarray
    skipped_frames: int
    latency_s: float


class AsyncTracker:
    """Track an object through a live frame stream.

    Frames are (rgb u8 (H,W,3), depth f32 (H,W)) pairs packed into one
    contiguous buffer for the ring.
    """

    def __init__(
        self,
        model: FoundationPose,
        target_name: str,
        frame_hw: tuple[int, int],
        capacity: int = 4,
        refine_itr: int = 1,
    ) -> None:
        from foundationpose_cpp_tpu import native

        h, w = frame_hw
        self._model = model
        self._target = target_name
        self._hw = (h, w)
        self._refine_itr = refine_itr
        # pack rgb (3*u8) + depth (f32) per pixel into bytes
        self._rgb_bytes = h * w * 3
        self._depth_bytes = h * w * 4
        self._ring = native.FrameRing(
            (self._rgb_bytes + self._depth_bytes,), np.uint8, capacity
        )
        self._stop = threading.Event()
        self._frame_counter = 0

    def push_frame(self, rgb: np.ndarray, depth: np.ndarray) -> None:
        """Producer side (any thread)."""
        h, w = self._hw
        assert rgb.shape == (h, w, 3) and rgb.dtype == np.uint8
        assert depth.shape == (h, w) and depth.dtype == np.float32
        buf = np.concatenate(
            [rgb.reshape(-1), depth.view(np.uint8).reshape(-1)]
        )
        self._ring.push(buf)
        self._frame_counter += 1

    def _unpack(self, buf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h, w = self._hw
        rgb = buf[: self._rgb_bytes].reshape(h, w, 3)
        depth = buf[self._rgb_bytes :].view(np.float32).reshape(h, w)
        return rgb, depth

    def run(
        self,
        initial_pose: np.ndarray,
        on_pose: Callable[[TrackRecord], None] | None = None,
        max_frames: int | None = None,
        idle_sleep_s: float = 0.0005,
    ) -> list[TrackRecord]:
        """Consumer loop: track until stop() or max_frames processed."""
        pose = np.asarray(initial_pose, dtype=np.float32)
        records: list[TrackRecord] = []
        processed = 0
        while not self._stop.is_set():
            item = self._ring.pop_latest()
            if item is None:
                if max_frames is not None and processed >= max_frames:
                    break
                time.sleep(idle_sleep_s)
                continue
            buf, skipped = item
            rgb, depth = self._unpack(buf)
            t0 = time.perf_counter()
            pose = self._model.track(
                rgb, depth, pose, self._target, self._refine_itr
            )
            rec = TrackRecord(
                frame_index=processed,
                pose=pose,
                skipped_frames=skipped,
                latency_s=time.perf_counter() - t0,
            )
            records.append(rec)
            if on_pose is not None:
                on_pose(rec)
            processed += 1
            if max_frames is not None and processed >= max_frames:
                break
        return records

    def stop(self) -> None:
        self._stop.set()

    @property
    def dropped_frames(self) -> int:
        return self._ring.dropped

    def close(self) -> None:
        self._ring.close()


def track_dataset(
    model: FoundationPose,
    target_name: str,
    frames: Iterable[tuple[np.ndarray, np.ndarray]],
    initial_pose: np.ndarray,
    refine_itr: int = 1,
) -> list[np.ndarray]:
    """Synchronous helper mirroring the reference demo loop
    (test_foundationpose.cpp:75-104): each output pose feeds the next frame."""
    pose = np.asarray(initial_pose, dtype=np.float32)
    out = []
    for rgb, depth in frames:
        pose = model.track(rgb, depth, pose, target_name, refine_itr)
        out.append(pose)
    return out
