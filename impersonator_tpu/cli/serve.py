"""Inference server: the production serving surface for motion imitation.

The reference ships batch scripts only; deploying it means wrapping the
per-frame python loop yourself. Here the jitted batched imitation core
is exposed over plain HTTP (stdlib ThreadingHTTPServer — zero deps, one
process per chip; put a real LB in front for fleets):

    python -m impersonator_tpu.cli.serve --port 8080 \
        [--load_path G.msgpack --smpl_model ... --image_size 256]

Endpoints (JSON unless noted):
  GET  /healthz            -> {"ok": true, "backend": ..., "personalized": ...}
  POST /personalize        -> body: JPEG/PNG bytes (raw). Optional header
                              X-Smpl: comma-separated 85 floats (skip HMR).
                              Runs source personalization; returns timings.
  POST /imitate            -> {"smpls": [[85 floats], ...]} -> base64 JPEG
                              frames (device-side u8 quantization before
                              readback). Requires a prior /personalize.
  POST /imitate_frames     -> {"frames": [b64 jpeg, ...]} — per-frame HMR
                              pose recovery, then imitation.
  POST /imitate_video      -> {"smpls": [[85 floats], ...], "fps": 25} ->
                              raw video/mp4 bytes. Predictions leave the
                              device as packed yuv420p (half the D2H
                              bytes of u8 RGB) and feed the H.264
                              encoder verbatim (ops/colorspace.py).
                              Requires ffmpeg on the host.

Every request is serialized through one lock: the model is one set of
device buffers, and requests batch internally through the compiled
step (batch = --batch, padded). Throughput therefore matches bench.py's
pipeline numbers, not a per-request python loop.
"""

from __future__ import annotations

import base64
import json
import threading
import time

import numpy as np

from impersonator_tpu.config import TestConfig, from_args


def _decode_image(data: bytes, image_size: int) -> np.ndarray:
    import cv2
    arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    if arr is None:
        raise ValueError("undecodable image payload")
    arr = cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
    from impersonator_tpu.utils.cv_utils import resize_img_hwc
    return resize_img_hwc(arr, image_size)


def _encode_jpegs(preds_u8: np.ndarray) -> list:
    import cv2
    out = []
    for frame in preds_u8:
        ok, buf = cv2.imencode(".jpg", cv2.cvtColor(frame,
                                                    cv2.COLOR_RGB2BGR))
        if not ok:
            raise RuntimeError("jpeg encode failed")
        out.append(base64.b64encode(buf.tobytes()).decode("ascii"))
    return out


class ImitatorService:
    """The model behind the HTTP layer; also usable in-process."""

    def __init__(self, cfg: TestConfig, batch: int = 8,
                 data_parallel: bool = False):
        import jax
        from impersonator_tpu.tasks.imitator import Imitator

        self.cfg = cfg
        self.batch = batch
        mesh = None
        if data_parallel and jax.device_count() > 1:
            # shard every request's frame batch over all local chips
            # (params replicate; SURVEY §2.3 — the frame axis is the
            # data-parallel axis)
            from impersonator_tpu.parallel.mesh import make_mesh
            mesh = make_mesh()
        self.imitator = Imitator(cfg, mesh=mesh)
        self.lock = threading.Lock()
        self.backend = jax.default_backend()
        import jax.numpy as jnp
        # device-side u8 quantization before readback (4x smaller D2H)
        self._quant = jax.jit(lambda x: jnp.clip(
            jnp.round((x + 1.0) * 127.5), 0, 255).astype(jnp.uint8))
        from impersonator_tpu.ops.colorspace import rgb_to_i420
        # device-side yuv420p packing for the mp4 endpoint (8x smaller
        # D2H than fp32; raw encoder input, zero host pixel work)
        self._i420 = jax.jit(rgb_to_i420)

    def personalize(self, img_bytes: bytes, smpl=None) -> dict:
        img = _decode_image(img_bytes, self.cfg.image_size)
        t0 = time.perf_counter()
        with self.lock:
            self.imitator.personalize(img, src_smpl=smpl)
        return {"ok": True, "seconds": round(time.perf_counter() - t0, 3)}

    def imitate(self, smpls: np.ndarray) -> dict:
        assert self.imitator.src_info is not None, "personalize first"
        t0 = time.perf_counter()
        with self.lock:
            preds = self.imitator.inference_by_smpls(
                smpls, cam_strategy=self.cfg.cam_strategy, batch=self.batch)
            preds_u8 = np.asarray(self._quant(preds))
        dt = time.perf_counter() - t0
        return {"ok": True, "frames": _encode_jpegs(preds_u8),
                "seconds": round(dt, 3),
                "fps": round(len(smpls) / max(dt, 1e-9), 1)}

    def imitate_video(self, smpls: np.ndarray, fps: int = 25) -> bytes:
        """Imitate and encode straight to mp4: device-packed yuv420p
        frames pipe into ffmpeg with no intermediate RGB pass."""
        assert self.imitator.src_info is not None, "personalize first"
        import os
        import tempfile

        from impersonator_tpu.utils.video import i420_to_mp4
        with self.lock:
            preds = self.imitator.inference_by_smpls(
                smpls, cam_strategy=self.cfg.cam_strategy, batch=self.batch)
            packed = np.asarray(self._i420(preds))
        with tempfile.TemporaryDirectory() as td:
            path = i420_to_mp4(packed, os.path.join(td, "pred.mp4"),
                               fps=fps)
            with open(path, "rb") as f:
                return f.read()

    def imitate_frames(self, frames_b64: list) -> dict:
        assert self.imitator.src_info is not None, "personalize first"
        import cv2
        from impersonator_tpu.utils.cv_utils import resize_img_hwc
        imgs = []
        for b in frames_b64:
            arr = cv2.imdecode(np.frombuffer(base64.b64decode(b), np.uint8),
                               cv2.IMREAD_COLOR)
            if arr is None:
                raise ValueError("undecodable frame")
            imgs.append(resize_img_hwc(cv2.cvtColor(arr, cv2.COLOR_BGR2RGB),
                                       224))
        t0 = time.perf_counter()
        with self.lock:
            preds = self.imitator.inference(
                np.stack(imgs), cam_strategy=self.cfg.cam_strategy,
                batch=self.batch)
            preds_u8 = np.asarray(self._quant(preds))
        dt = time.perf_counter() - t0
        return {"ok": True, "frames": _encode_jpegs(preds_u8),
                "seconds": round(dt, 3),
                "fps": round(len(imgs) / max(dt, 1e-9), 1)}


def make_server(service: ImitatorService, host: str = "127.0.0.1",
                port: int = 8080):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet access log
            pass

        def _reply_bytes(self, payload: bytes, ctype: str):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {
                    "ok": True, "backend": service.backend,
                    "personalized": service.imitator.src_info is not None})
            else:
                self._reply(404, {"ok": False, "error": "not found"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", "0"))
            data = self.rfile.read(n)
            try:
                if self.path == "/personalize":
                    smpl_hdr = self.headers.get("X-Smpl")
                    smpl = (np.asarray([float(v) for v in
                                        smpl_hdr.split(",")], np.float32)
                            if smpl_hdr else None)
                    if smpl is not None and smpl.shape != (85,):
                        raise ValueError("X-Smpl must be 85 floats")
                    self._reply(200, service.personalize(data, smpl))
                elif self.path == "/imitate":
                    req = json.loads(data)
                    smpls = np.asarray(req["smpls"], np.float32)
                    if smpls.ndim != 2 or smpls.shape[1] != 85:
                        raise ValueError("smpls must be (N, 85)")
                    self._reply(200, service.imitate(smpls))
                elif self.path == "/imitate_frames":
                    req = json.loads(data)
                    self._reply(200, service.imitate_frames(req["frames"]))
                elif self.path == "/imitate_video":
                    import shutil
                    if shutil.which("ffmpeg") is None:
                        raise ValueError("ffmpeg not available on host")
                    req = json.loads(data)
                    smpls = np.asarray(req["smpls"], np.float32)
                    if smpls.ndim != 2 or smpls.shape[1] != 85:
                        raise ValueError("smpls must be (N, 85)")
                    mp4 = service.imitate_video(
                        smpls, fps=int(req.get("fps", 25)))
                    self._reply_bytes(mp4, "video/mp4")
                else:
                    self._reply(404, {"ok": False, "error": "not found"})
            except Exception as e:  # one bad request must not kill serving
                self._reply(400, {"ok": False, "error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import argparse
    cfg = from_args(TestConfig, argv)
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard request batches over all local devices "
                         "(jax.sharding data mesh; params replicate)")
    extra, _ = ap.parse_known_args(argv)

    service = ImitatorService(cfg, batch=extra.batch,
                              data_parallel=extra.data_parallel)
    server = make_server(service, extra.host, extra.port)
    print(f"serving motion imitation on {extra.host}:{server.server_port} "
          f"(backend={service.backend}, image_size={cfg.image_size})",
          flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
