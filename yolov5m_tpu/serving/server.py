"""Production batching detection server (TPU serving runtime).

The reference stops at a single-image detect script (reference
detect.py:16-55); production serving needs a running process that turns
concurrent image requests into fixed-shape device batches. This module is
that runtime, built from the framework's own pieces:

  * host data plane: native GIL-free libjpeg decode + C letterbox
    (native/preprocess.cc via data/native.py) — one reader thread per
    connection, so decode parallelizes across clients on many-core hosts;
  * device data plane: ONE jitted static-shape program (normalize + forward
    + fused decode + NMS, ops/postprocess.py) at a fixed batch size; short
    requests are padded — XLA never sees a dynamic shape, so there is
    exactly one compilation for the life of the server. Ingress is uint8
    (normalize on device): 1 byte/pixel over PCIe/tunnel instead of 4;
  * batching: a single batcher thread collects up to `batch_size` requests,
    waiting at most `max_wait_ms` after the first (classic
    latency/throughput knob). bs=128 is the measured single-chip throughput
    optimum (benchmarks/profile_batchsize.py); small deployments should set
    the batch to their p99 concurrency;
  * depth-1 pipelining: while batch i runs on device, the batcher collects
    and DISPATCHES batch i+1 before fetching i's results, so the device
    never idles on the host's result-fetch + JSON + socket work (same
    software pipeline the Evaluator uses — measured 11-22% eval wall-time
    saving, benchmarks/profile_eval_wall.py). Under no load the in-flight
    batch is flushed immediately; `overlap=False` restores strict
    one-batch-at-a-time behavior for debugging.

Wire protocol (dependency-free, length-prefixed):
  request  = uint32_be length | image bytes (JPEG fast path, anything PIL
             reads otherwise); length 0 closes the connection gracefully.
  response = uint32_be length | UTF-8 JSON:
             {"ok": true, "width": W, "height": H,
              "detections": [{"class_id": i, "label": str,
                              "confidence": p, "box": [x1, y1, x2, y2]}]}
             (box in ORIGINAL-image pixel coords, like cli/detect.py) or
             {"ok": false, "error": "..."}.
Responses come back in request order on each connection (the per-connection
reader decodes serially; the batcher is single-threaded and FIFO).
"""

from __future__ import annotations

import json
import queue
import socket
import struct
import threading
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HDR = struct.Struct(">I")
_MAX_REQUEST = 64 * 1024 * 1024  # 64 MB: reject absurd frames early
_STOP = object()  # batcher shutdown sentinel (distinct from any request)


def _read_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    """None on EOF or any socket error — an abrupt client reset (RST) is
    routine in production and must read as a clean disconnect, not an
    unhandled ConnectionResetError killing the reader thread."""
    buf = b""
    while len(buf) < n:
        try:
            chunk = sock.recv(n - len(buf))
        except OSError:
            return None
        if not chunk:
            return None
        buf += chunk
    return buf


def _decode_image(data: bytes) -> Optional[np.ndarray]:
    """(h, w, 3) RGB uint8, native libjpeg fast path, PIL fallback."""
    from yolov5m_tpu.data.native import decode_jpeg
    img = decode_jpeg(data)
    if img is not None:
        return img
    try:
        import io
        from PIL import Image
        with Image.open(io.BytesIO(data)) as im:
            return np.asarray(im.convert("RGB"))
    except Exception:
        return None


@dataclass
class _Pending:
    conn: socket.socket
    wlock: threading.Lock
    image: Optional[np.ndarray] = None           # letterboxed uint8
    geom: Optional[Tuple] = None                 # (ratio, (dw, dh), orig_hw)
    error: Optional[str] = None
    payload: dict = field(default_factory=dict)


class DetectionServer:
    """Batching TCP detection server around a (possibly fused) YOLOv5.

    model/variables: anything `model.apply(variables, x, train=False)`
    accepts — fold BatchNorm first for serving (models/fuse.py).
    Use `with DetectionServer(...) as srv:` or start()/stop().
    """

    def __init__(self, model, variables, anchors_norm,
                 labels: Optional[Sequence[str]] = None,
                 image_size: int = 640,
                 conf_threshold: float = 0.25,
                 iou_threshold: float = 0.45,
                 max_detections: int = 300,
                 pre_nms_topk: Optional[int] = None,
                 batch_size: int = 16,
                 max_wait_ms: float = 5.0,
                 overlap: bool = True,
                 dp_mesh=None,
                 tp_mesh=None,
                 host: str = "127.0.0.1",
                 port: int = 0):
        """dp_mesh: a jax.sharding.Mesh with a "data" axis — the device
        batch is then served by parallel/infer.py's shard_mapped pipeline
        (params replicated, batch sharded, zero collectives), so N chips
        serve N× the single-chip throughput behind one socket. batch_size
        must be a MULTIPLE of the mesh size; 128 per device is the
        measured optimum.

        tp_mesh: a (data, model) mesh from parallel/tp.py's make_tp_mesh —
        conv channels sharded over the model axis, batch over the data
        axis (parallel/tp.py). For serving family variants too large for
        one chip, or latency floors where DP alone can't shrink the batch.
        Mutually exclusive with dp_mesh; batch_size must be a multiple of
        the data-axis size."""
        import jax
        import jax.numpy as jnp
        from yolov5m_tpu.config import Config
        from yolov5m_tpu.ops.postprocess import fused_detect
        from yolov5m_tpu.ops.preprocess import normalize_uint8

        # normalize in the model's compute dtype: for bf16 serving this is
        # the one-pass u8→bf16 ingress (bit-identical to f32 division for
        # all 256 codes — see normalize_uint8; measured +2.2% e2e)
        compute_dtype = getattr(model, "dtype", None) or jnp.float32

        self.labels = list(labels) if labels else None
        self.image_size = int(image_size)
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.overlap = bool(overlap)
        self._host, self._port = host, int(port)
        # bind target for (re)start: a first start with port=0 must not pin
        # the assigned ephemeral port (it can linger in TIME_WAIT on restart)
        self._req_port = int(port)

        anchors_norm = jnp.asarray(anchors_norm)
        if pre_nms_topk is None:
            pre_nms_topk = Config().topk_for_conf(conf_threshold)

        assert dp_mesh is None or tp_mesh is None, \
            "dp_mesh and tp_mesh are mutually exclusive (TP already " \
            "composes with DP on its own (data, model) mesh)"
        if tp_mesh is not None:
            from yolov5m_tpu.parallel import make_tp_infer_fn
            data_axis = "data" if "data" in tp_mesh.axis_names else None
            n_data = tp_mesh.shape[data_axis] if data_axis else 1
            assert self.batch_size % n_data == 0, \
                (f"batch_size {batch_size} must be a multiple of the "
                 f"data-axis size {n_data}")
            # uint8 ingress + normalize live INSIDE the TP jit: its
            # in_shardings must bind the real input, not a wrapper's
            infer = make_tp_infer_fn(
                model, variables, anchors_norm, tp_mesh,
                data_axis=data_axis,
                conf_threshold=conf_threshold, iou_threshold=iou_threshold,
                max_detections=max_detections, pre_nms_topk=pre_nms_topk,
                uint8_ingress=True)
        elif dp_mesh is not None:
            from yolov5m_tpu.parallel import make_dp_infer_fn
            assert self.batch_size % dp_mesh.size == 0, \
                (f"batch_size {batch_size} must be a multiple of the mesh "
                 f"size {dp_mesh.size}")
            dp_infer = make_dp_infer_fn(
                model, variables, anchors_norm, dp_mesh,
                conf_threshold=conf_threshold, iou_threshold=iou_threshold,
                max_detections=max_detections, pre_nms_topk=pre_nms_topk)

            @jax.jit
            def infer(x):
                # same uint8 ingress as below; normalize before the DP fan-out
                return dp_infer(normalize_uint8(x, compute_dtype))
        else:
            @jax.jit
            def infer(x):
                # uint8 ingress: the normalize runs on device so the
                # host→device transfer is 1 byte/pixel instead of 4 (at
                # bs=128/640² that is 157 MB vs 629 MB per batch —
                # PCIe/tunnel bound in production), in the compute dtype
                # (bit-identical to host f32 division, see normalize_uint8)
                x = normalize_uint8(x, compute_dtype)
                preds = model.apply(variables, x, train=False)
                return fused_detect(preds, anchors_norm,
                                    conf_threshold=conf_threshold,
                                    iou_threshold=iou_threshold,
                                    max_detections=max_detections,
                                    pre_nms_topk=pre_nms_topk)

        self._infer = infer
        self._jnp = jnp
        # bounded: each queued request holds a decoded letterboxed frame
        # (~1.2 MB at 640²), and the client API explicitly supports
        # pipelining (send() without recv()) — an unbounded queue lets a
        # few fast clients OOM the host. When full, reader threads block
        # in _enqueue, which stops them reading their sockets: natural
        # per-connection TCP backpressure instead of dropped requests.
        self._queue: "queue.Queue[Optional[_Pending]]" = queue.Queue(
            maxsize=max(4 * batch_size, 64))
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []
        self._listener: Optional[socket.socket] = None
        self._bufs: List[Optional[np.ndarray]] = [None, None]
        self._buf_i = 0

    # -- lifecycle -----------------------------------------------------

    def start(self, warmup: bool = True) -> "DetectionServer":
        # restartable: clear the stop flag and drain any sentinel a previous
        # stop() left behind (the batcher can exit on the flag alone,
        # leaving its _STOP unconsumed)
        self._stop.clear()
        while True:
            try:
                self._queue.get_nowait()
            except queue.Empty:
                break
        self._threads = []
        if warmup:  # compile before accepting traffic (first jit is slow)
            x = self._jnp.zeros(
                (self.batch_size, self.image_size, self.image_size, 3),
                self._jnp.uint8)
            det, valid = self._infer(x)
            det.block_until_ready()
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((self._host, self._req_port))
        self._listener.listen(128)
        self._port = self._listener.getsockname()[1]
        for fn in (self._accept_loop, self._batch_loop):
            t = threading.Thread(target=fn, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._listener is not None:
            try:
                self._listener.close()
            except OSError:
                pass
        try:
            self._queue.put_nowait(_STOP)  # wake an idle batcher
        except queue.Full:
            pass                           # not idle: it checks the flag
        import time
        for t in self._threads:
            t.join(timeout=5)
        if any(t.is_alive() for t in self._threads):
            # a degraded device can stall the batcher past the join
            # timeout; draining NOW would answer queued requests out of
            # order with the batcher's own late replies (the protocol
            # correlates responses purely by order) — leave the queue to
            # the still-live batcher instead
            print("WARNING: batcher still busy at stop(); queued requests "
                  "left to it", flush=True)
            return
        # fail anything still queued: those clients would otherwise hang
        # in recv() until their socket timeout, and a later start() used
        # to discard them silently. Two passes with a grace longer than
        # _enqueue's put timeout close the race where a reader blocked in
        # put() lands an item just after the first pass.
        for grace in (0.0, 0.3):
            if grace:
                time.sleep(grace)
            while True:
                try:
                    item = self._queue.get_nowait()
                except queue.Empty:
                    break
                if item is _STOP or item is None:
                    continue
                self._send(item.conn, item.wlock,
                           {"ok": False, "error": "server stopped"})

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    @property
    def port(self) -> int:
        return self._port

    # -- host data plane ------------------------------------------------

    def _accept_loop(self) -> None:
        import time
        while not self._stop.is_set():
            try:
                conn, _ = self._listener.accept()
            except OSError:
                if self._stop.is_set():
                    return  # listener closed by stop()
                # transient accept failure (EMFILE under a connection
                # burst, ECONNABORTED): a permanent exit here would leave
                # a healthy-looking server that refuses all NEW clients
                # forever — back off briefly and keep accepting
                time.sleep(0.05)
                continue
            t = threading.Thread(target=self._reader_loop, args=(conn,),
                                 daemon=True)
            t.start()

    def _enqueue(self, item: "_Pending") -> bool:
        """Blocking put that stays responsive to stop(): when the bounded
        queue is full the reader simply stops reading its socket (TCP
        backpressure). Returns False if the server stopped meanwhile."""
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.25)
                return True
            except queue.Full:
                continue
        return False

    def _reader_loop(self, conn: socket.socket) -> None:
        """Read frames, decode + letterbox inline (native decode drops the
        GIL, so reader threads parallelize across connections), enqueue."""
        from yolov5m_tpu.data.native import letterbox
        wlock = threading.Lock()
        with conn:
            while not self._stop.is_set():
                hdr = _read_exact(conn, _HDR.size)
                if hdr is None:
                    return
                (n,) = _HDR.unpack(hdr)
                if n == 0:
                    return  # graceful close
                if n > _MAX_REQUEST:
                    # the error must ride the FIFO like any other response
                    # (answering out-of-band here would jump ahead of this
                    # connection's still-queued requests); drain the payload
                    # so the stream stays framed and the connection usable
                    item = _Pending(conn, wlock)
                    item.error = f"frame too large ({n} bytes)"
                    left = n
                    while left > 0:
                        try:
                            chunk = conn.recv(min(left, 1 << 20))
                        except OSError:
                            chunk = b""   # reset mid-drain == disconnect
                        if not chunk:
                            self._enqueue(item)
                            return
                        left -= len(chunk)
                    if not self._enqueue(item):
                        return
                    continue
                data = _read_exact(conn, n)
                if data is None:
                    return
                item = _Pending(conn, wlock)
                img = _decode_image(data)
                if img is None:
                    item.error = "undecodable image"
                else:
                    s = self.image_size
                    boxed, ratio, (dw, dh) = letterbox(img, (s, s))
                    item.image = boxed
                    item.geom = (ratio, (dw, dh), img.shape[:2])
                if not self._enqueue(item):
                    return

    # -- device data plane ----------------------------------------------

    def _batch_loop(self) -> None:
        """Depth-1 software pipeline: batch i+1 is collected and dispatched
        (async — jax returns futures) BEFORE batch i's results are fetched,
        so the result-fetch/JSON/socket host work of batch i overlaps batch
        i+1's device time. With no waiting traffic the in-flight batch is
        flushed immediately, so idle-load latency is unchanged."""
        inflight = None  # dispatched but not yet responded
        while not self._stop.is_set():
            if inflight is None:
                seed = self._queue.get()           # idle: block for traffic
            else:
                try:                               # device busy: don't block
                    seed = self._queue.get_nowait()
                except queue.Empty:
                    self._respond(inflight)        # no traffic: flush i
                    inflight = None
                    continue
            if seed is _STOP:
                if inflight is not None:
                    self._respond(inflight)
                return
            nxt = self._dispatch(self._gather(seed))
            if inflight is not None:
                self._respond(inflight)            # device already runs nxt
            if self.overlap:
                inflight = nxt
            else:
                self._respond(nxt)
        if inflight is not None:
            self._respond(inflight)

    def _gather(self, first: _Pending) -> List[_Pending]:
        """Collect up to batch_size requests, waiting at most max_wait_ms
        after the first."""
        import time
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.batch_size:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if item is _STOP:
                self._stop.set()  # finish this batch, then exit the loop
                break
            batch.append(item)
        return batch

    def _dispatch(self, batch: List[_Pending]):
        """Enqueue one device batch; returns (batch, todo, det, valid)
        futures without synchronizing."""
        todo = [b for b in batch if b.error is None]
        det = valid = None
        if todo:
            try:
                # two ping-pong host buffers (depth-1 pipeline => at most 2
                # batches staged): no per-batch 157MB-at-bs=128 allocation.
                # Stale padding rows are read by the device but their
                # outputs are never consumed (only rows 0..len(todo)-1 are).
                s = self.image_size
                if self._bufs[self._buf_i] is None:
                    self._bufs[self._buf_i] = np.zeros(
                        (self.batch_size, s, s, 3), np.uint8)
                x = self._bufs[self._buf_i]
                self._buf_i ^= 1
                for i, item in enumerate(todo):
                    x[i] = item.image          # letterboxed uint8, as decoded
                # jnp.array (copy=True): jnp.asarray may zero-copy alias the
                # numpy buffer on the CPU backend, and we mutate it again
                # two batches later
                det, valid = self._infer(self._jnp.array(x))
            except Exception as e:  # keep the batcher alive: fail the batch
                for item in todo:
                    item.error = f"inference dispatch failed: {e}"
                todo, det, valid = [], None, None
        return batch, todo, det, valid

    def _respond(self, inflight) -> None:
        """Fetch a dispatched batch's results (the only device sync) and
        answer every request in arrival order."""
        batch, todo, det, valid = inflight
        if todo:
            try:
                det = np.asarray(det)     # sync point
                valid = np.asarray(valid)
                for i, item in enumerate(todo):
                    item.payload = self._to_payload(det[i][valid[i]],
                                                    item.geom)
            except Exception as e:  # keep the batcher alive
                for item in todo:
                    item.error = f"inference failed: {e}"
        for item in batch:
            if item.error is not None:
                item.payload = {"ok": False, "error": item.error}
            self._send(item.conn, item.wlock, item.payload)

    def _to_payload(self, rows: np.ndarray, geom) -> dict:
        # numpy twin on purpose: this runs per REQUEST in the single
        # batcher thread, and the jnp version costs several device
        # round-trips per call (~4ms each over a remote link) — at bs=128
        # that would serialize seconds of dispatch into every response
        # cycle and starve the depth-1 pipeline
        from yolov5m_tpu.ops.boxes import unletterbox_boxes_np
        ratio, (dw, dh), orig_hw = geom
        dets = []
        if len(rows):
            boxes = unletterbox_boxes_np(rows[:, 2:6], ratio,
                                         (dw, dh), orig_hw)
            for r, b in zip(rows, boxes):
                cid = int(r[0])
                label = (self.labels[cid]
                         if self.labels and cid < len(self.labels) else str(cid))
                dets.append({"class_id": cid, "label": label,
                             "confidence": round(float(r[1]), 5),
                             "box": [round(float(v), 2) for v in b]})
        return {"ok": True, "width": int(orig_hw[1]),
                "height": int(orig_hw[0]), "detections": dets}

    @staticmethod
    def _send(conn: socket.socket, wlock: threading.Lock, payload: dict) -> None:
        data = json.dumps(payload).encode()
        try:
            with wlock:
                conn.sendall(_HDR.pack(len(data)) + data)
        except OSError:
            pass  # client went away; nothing to do


class DetectionClient:
    """Minimal client for DetectionServer's length-prefixed protocol."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 timeout: float = 60.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)

    def detect(self, image_bytes: bytes) -> dict:
        self.send(image_bytes)
        return self.recv()

    def send(self, image_bytes: bytes) -> None:
        """Enqueue one request without waiting — pair with recv() to
        pipeline several requests per connection (responses come back in
        send order)."""
        self._sock.sendall(_HDR.pack(len(image_bytes)) + image_bytes)

    def recv(self) -> dict:
        hdr = _read_exact(self._sock, _HDR.size)
        if hdr is None:
            raise ConnectionError("server closed the connection")
        (n,) = _HDR.unpack(hdr)
        data = _read_exact(self._sock, n)
        if data is None:
            raise ConnectionError("truncated response")
        return json.loads(data.decode())

    def close(self) -> None:
        try:
            self._sock.sendall(_HDR.pack(0))
        except OSError:
            pass
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
