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
    # host time spent issuing the (async) device dispatch; the gap to
    # latency_s is transfer + in-flight pipeline time
    dispatch_s: float = 0.0


class AsyncTracker:
    """Track an object through a live frame stream.

    Frames are (rgb u8 (H,W,3), depth (H,W)) pairs packed into one
    contiguous buffer for the ring. The default wire format carries depth
    as uint16 millimeters (the sensor-native encoding the reference reads,
    help_func.hpp:10-52): H*W*5 bytes per frame instead of H*W*7, cutting
    the per-frame H2D transfer -- the deployment path's known bottleneck
    -- by 29%. depth_format="f32" keeps the metric-float layout; opt-in
    rgb_half additionally ships the color plane at half resolution
    (H*W*2.75 bytes total -- see make_packed_tracker for the quality
    trade).
    """

    def __init__(
        self,
        model: FoundationPose,
        target_name: str,
        frame_hw: tuple[int, int],
        capacity: int = 4,
        refine_itr: int = 1,
        depth_format: str = "u16mm",
        rgb_half: bool = False,
    ) -> None:
        from foundationpose_cpp_tpu import native

        h, w = frame_hw
        self._model = model
        self._target = target_name
        self._hw = (h, w)
        self._refine_itr = refine_itr
        self._depth_format = depth_format
        self._rgb_half = bool(rgb_half)
        # pack rgb (3*u8, optionally half-res) + depth (u16 mm | f32)
        self._rgb_bytes = (
            (h // 2) * (w // 2) * 3 if rgb_half else h * w * 3
        )
        self._depth_bytes = h * w * {"u16mm": 2, "f32": 4}[depth_format]
        self._ring = native.FrameRing(
            (self._rgb_bytes + self._depth_bytes,), np.uint8, capacity
        )
        self._stop = threading.Event()
        self._frame_counter = 0
        self._packed_step = None  # jitted packed-frame Track, built lazily
        self._uploader: threading.Thread | None = None

    def push_frame(self, rgb: np.ndarray, depth: np.ndarray) -> None:
        """Producer side (any thread). depth: f32 meters, or u16
        millimeters when the tracker runs the (default) u16mm format --
        sensor frames then pass through without conversion."""
        h, w = self._hw
        if rgb.shape != (h, w, 3) or rgb.dtype != np.uint8:
            raise ValueError(f"rgb must be u8 ({h},{w},3), got {rgb.dtype} {rgb.shape}")
        u16_ok = self._depth_format == "u16mm" and depth.dtype == np.uint16
        if depth.shape != (h, w) or (depth.dtype != np.float32 and not u16_ok):
            raise ValueError(
                f"depth must be f32 meters ({h},{w})"
                + (" or u16 millimeters" if self._depth_format == "u16mm" else "")
                + f", got {depth.dtype} {depth.shape}"
            )
        self._ring.push(
            FoundationPose.pack_frame(
                rgb, depth, self._depth_format, rgb_half=self._rgb_half
            )
        )
        self._frame_counter += 1

    def _unpack(self, buf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h, w = self._hw
        if self._rgb_half:
            rgb = buf[: self._rgb_bytes].reshape(h // 2, w // 2, 3)
        else:
            rgb = buf[: self._rgb_bytes].reshape(h, w, 3)
        if self._depth_format == "u16mm":
            depth = (
                buf[self._rgb_bytes:].view(np.uint16).reshape(h, w)
                .astype(np.float32) * 1e-3
            )
        else:
            depth = buf[self._rgb_bytes:].view(np.float32).reshape(h, w)
        return rgb, depth

    def run(
        self,
        initial_pose: np.ndarray,
        on_pose: Callable[[TrackRecord], None] | None = None,
        max_frames: int | None = None,
        idle_sleep_s: float = 0.0005,
        pipeline_depth: int = 3,
    ) -> list[TrackRecord]:
        """Consumer loop: track until stop() or max_frames processed.

        Deployment-shaped pipelining (three overlapped stages):
          uploader thread: ring.pop_latest -> ONE device_put of the packed
            u8 frame (H2D overlaps the tracking dispatches);
          this thread: chained async dispatches of the packed-frame Track
            program -- the pose stays a DEVICE array between frames, so no
            per-frame D2H serializes the chain;
          readback: poses are fetched `pipeline_depth` frames behind the
            dispatch front (0 = fully synchronous, old behavior).
        on_pose still fires in frame order, `pipeline_depth` frames late.
        """
        import queue

        import jax

        if self._uploader is not None and self._uploader.is_alive():
            # a previous run()'s uploader is still wedged (e.g. blocked in a
            # stalled device_put); a second consumer on the single-consumer
            # ring would steal/corrupt frames
            raise RuntimeError(
                "previous run()'s uploader has not exited; call stop() and "
                "wait for it before starting a new run"
            )
        if self._packed_step is None:
            self._packed_step = self._model.make_packed_tracker(
                self._target, self._hw, self._refine_itr,
                depth_format=self._depth_format, rgb_half=self._rgb_half,
            )
        step = self._packed_step
        pose_dev = jax.device_put(
            np.asarray(initial_pose, dtype=np.float32)
        )
        records: list[TrackRecord] = []
        staged: "queue.Queue" = queue.Queue(maxsize=2)
        done = object()
        # run-LOCAL stop flag: a wedged uploader from this run can never be
        # revived by a later run clearing the shared event (the shared
        # self._stop only carries the external stop() request)
        run_stop = threading.Event()

        def stopped() -> bool:
            return run_stop.is_set() or self._stop.is_set()

        def uploader() -> None:
            n = 0
            while not stopped() and (max_frames is None or n < max_frames):
                item = self._ring.pop_latest()
                if item is None:
                    # wait for the producer (same as the pre-pipelined loop:
                    # a bounded run blocks until max_frames frames arrive)
                    time.sleep(idle_sleep_s)
                    continue
                buf, skipped = item
                t_cap = time.perf_counter()
                dev = jax.device_put(buf)
                while not stopped():
                    try:
                        staged.put((dev, skipped, t_cap), timeout=0.2)
                        n += 1
                        break
                    except queue.Full:
                        continue
            while not stopped():
                try:
                    staged.put(done, timeout=0.2)
                    return
                except queue.Full:
                    continue

        up = threading.Thread(target=uploader, daemon=True)
        self._uploader = up
        up.start()
        pending: list[tuple[int, float, int, float, "jax.Array"]] = []
        processed = 0

        def complete(entry) -> None:
            idx, t_cap, skipped, disp, dev = entry
            pose_np = np.asarray(dev)
            rec = TrackRecord(
                frame_index=idx,
                pose=pose_np,
                skipped_frames=skipped,
                latency_s=time.perf_counter() - t_cap,
                dispatch_s=disp,
            )
            records.append(rec)
            if on_pose is not None:
                on_pose(rec)

        try:
            while not self._stop.is_set():
                try:
                    item = staged.get(timeout=0.2)
                except queue.Empty:
                    continue
                if item is done:
                    break
                dev, skipped, t_cap = item
                t0 = time.perf_counter()
                pose_dev = step(dev, pose_dev)
                disp = time.perf_counter() - t0
                pending.append((processed, t_cap, skipped, disp, pose_dev))
                processed += 1
                if len(pending) > max(0, pipeline_depth):
                    complete(pending.pop(0))
                if max_frames is not None and processed >= max_frames:
                    break
            for entry in pending:
                complete(entry)
            pending.clear()
        finally:
            run_stop.set()
            while True:  # unblock the uploader if it is mid-put
                try:
                    staged.get_nowait()
                except queue.Empty:
                    break
            up.join(timeout=2.0)
            # run_stop stays set forever, so even an uploader wedged past
            # the join timeout (e.g. in a stalled device_put) exits when it
            # wakes instead of consuming the next run's ring frames
            self._stop.clear()  # run() may be called again
        return records

    def stop(self) -> None:
        self._stop.set()

    @property
    def dropped_frames(self) -> int:
        return self._ring.dropped

    @property
    def pushed_frames(self) -> int:
        """Frames the producer has pushed (dropped + consumed + in-ring)."""
        return self._frame_counter

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
