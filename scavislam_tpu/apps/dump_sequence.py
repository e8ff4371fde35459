"""Sequence recorder: write stereo/RGB-D frames in the reference dump format.

Equivalent of the reference's dump_rgbd executable
(/root/reference/scavislam/dump_rgbd.cpp): a background FileWriter thread
writes `img_%06d_left.png` plus the float disparity reinterpreted as a
4-channel byte PNG (`img_%06d_disp.png`, dump_rgbd.cpp:200-218) so recorded
runs replay byte-exactly through the FileGrabber. With no live RGB-D camera
in this environment, the source is the synthetic renderer (or any frame
iterator passed to `record`); the format is identical.

Usage: python -m scavislam_tpu.apps.dump_sequence <out_dir> [n_frames]
"""

from __future__ import annotations

import argparse
import os
import queue
import threading

import numpy as np
from PIL import Image

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.utils.config import Config


class FileWriter:
    """Background writer (parity: FileWriter + monitor, dump_rgbd.cpp:72-126)."""

    def __init__(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self._q: queue.Queue = queue.Queue(maxsize=50)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def push(self, frame_id: int, left_u8, right_u8=None, disp_f32=None):
        self._q.put((frame_id, left_u8, right_u8, disp_f32))

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            fid, left, right, disp = item
            Image.fromarray(left).save(
                os.path.join(self.out_dir, f"img_{fid:06d}_left.png")
            )
            if right is not None:
                Image.fromarray(right).save(
                    os.path.join(self.out_dir, f"img_{fid:06d}_right.png")
                )
            if disp is not None:
                raw = disp.astype(np.float32).view(np.uint8).reshape(
                    *disp.shape, 4
                )
                Image.fromarray(raw, mode="RGBA").save(
                    os.path.join(self.out_dir, f"img_{fid:06d}_disp.png")
                )

    def close(self):
        self._q.put(None)
        self._thread.join(timeout=10.0)


def record(frames, out_dir: str, with_disp=True):
    w = FileWriter(out_dir)
    n = 0
    for f in frames:
        left = (np.asarray(f["left"]) * 255).astype(np.uint8)
        right = (
            (np.asarray(f["right"]) * 255).astype(np.uint8)
            if "right" in f else None
        )
        disp = np.asarray(f.get("disp_gt", f.get("disp"))) if with_disp else None
        w.push(f.get("frame_id", n), left, right, disp)
        n += 1
    w.close()
    return n


def record_live(grabber, out_dir: str, n_frames: int,
                timeout: float = 60.0) -> int:
    """Record from a polled RgbdGrabber — the reference's dump_rgbd main
    loop (dump_rgbd.cpp:69-126): poll the latest-value camera monitor, hand
    each new frame to the background FileWriter. Frames arriving between
    polls are dropped by the grabber (reference semantics); frame ids are
    assigned at RECORD time, like the reference's counter."""
    import time

    w = FileWriter(out_dir)
    n = 0
    t0 = time.time()
    try:
        while n < n_frames and time.time() - t0 < timeout:
            f = grabber.getFrame()
            if f is None:
                time.sleep(0.002)
                continue
            rgb, disp = f
            left = (rgb if rgb.dtype == np.uint8
                    else (np.clip(rgb, 0, 1) * 255 + 0.5).astype(np.uint8))
            w.push(n, left, None, np.asarray(disp, np.float32))
            n += 1
    finally:
        w.close()
    return n


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("n_frames", nargs="?", type=int, default=60)
    ap.add_argument("--step", type=float, default=0.02)
    ap.add_argument("--config", help="reference-format .cfg (camera; the "
                                     "reference's dump_rgbd takes one too)")
    ap.add_argument("--source", default="synthetic",
                    help="synthetic (default: render directly to disk) | "
                         "live (poll an RgbdGrabber fed by a synthetic "
                         "camera — the reference's live dump_rgbd loop with "
                         "the OpenNI callback replaced, no camera SDK in "
                         "this environment) | dir:PATH (re-record an "
                         "existing dump replayed as a live source)")
    ap.add_argument("--fps", type=float, default=30.0,
                    help="live-source capture rate (frames between polls "
                         "are dropped, latest-value semantics)")
    args = ap.parse_args(argv)

    if args.config:
        from scavislam_tpu.utils.config import load_config

        cfg = load_config(args.config)
    else:
        cfg = Config()
    cam = StereoCamera.create(
        cfg.cam.f, (cfg.cam.px, cfg.cam.py),
        (cfg.cam.width, cfg.cam.height), cfg.cam.baseline,
    )

    if args.source == "synthetic":
        from scavislam_tpu.io.synthetic import SyntheticSequence

        seq = SyntheticSequence(cam, n_frames=args.n_frames, step=args.step)
        n = record(iter(seq), args.out_dir)
    elif args.source == "live" or args.source.startswith("dir:"):
        from scavislam_tpu.io.rgbd_grabber import (
            RgbdGrabber,
            directory_source,
        )

        if args.source == "live":
            from scavislam_tpu.io.synthetic import SyntheticSequence

            seq = SyntheticSequence(cam, n_frames=args.n_frames,
                                    step=args.step)
            state = {"i": 0}

            def camera():
                i = state["i"]
                if i >= args.n_frames:
                    return None  # a real camera never ends the stream
                f = seq.frame(i)
                state["i"] += 1
                left = (np.clip(np.asarray(f["left"]), 0, 1) * 255
                        + 0.5).astype(np.uint8)
                return left, np.asarray(f["disp_gt"], np.float32)

            source = camera
        else:
            source = directory_source(args.source[4:])
        grabber = RgbdGrabber()
        grabber.start(source, fps=args.fps)
        try:
            n = record_live(grabber, args.out_dir, args.n_frames)
        finally:
            grabber.stop()
    else:
        ap.error(f"unknown --source {args.source!r}")
    print(f"wrote {n} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
