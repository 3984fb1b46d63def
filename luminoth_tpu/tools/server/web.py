"""Web demo server: upload an image, get JSON detections + a preview.

reference: luminoth/tools/server/web.py:31-111 (Flask app; ``GET /`` page,
``POST /api/<model>/predict/`` multipart endpoint; model loaded on a
background thread so startup doesn't block the first request; min-prob
forced low so the frontend slider can re-filter). Implemented on the
stdlib's threading HTTP server — same API surface, no Flask dependency.
"""

import io
import json
import logging
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import click
import numpy as np

logger = logging.getLogger(__name__)

PREDICTOR_NETWORK = None
NETWORK_START_THREAD = None
MIN_PROB_FOR_FRONTEND = 0.01
BATCH_SIZE = 8
BATCH_WAIT_MS = 2.0


def _template_path():
    return os.path.join(os.path.dirname(__file__), "templates", "index.html")


def _parse_multipart(body, content_type):
    """Minimal multipart/form-data parser (the stdlib cgi module is
    deprecated/removed in newer pythons). Returns (image_bytes, params)."""
    match = re.search(r'boundary="?([^";,]+)"?', content_type)
    if not match:
        return None, {}
    boundary = b"--" + match.group(1).encode()
    image_bytes = None
    params = {}
    for part in body.split(boundary):
        # Trim exactly the framing CRLFs (one each side) — a blanket
        # strip(b"\r\n") would eat real payload bytes from binary
        # content that happens to start/end with 0x0D/0x0A.
        if part.startswith(b"\r\n"):
            part = part[2:]
        if part.endswith(b"\r\n"):
            part = part[:-2]
        if not part or part == b"--":
            continue
        header_blob, _, content = part.partition(b"\r\n\r\n")
        headers = header_blob.decode("utf-8", "replace")
        name_match = re.search(r'name="([^"]+)"', headers)
        if not name_match:
            continue
        name = name_match.group(1)
        if name == "image":
            image_bytes = content
        else:
            params[name] = content.decode("utf-8", "replace").strip()
    return image_bytes, params


def start_network(config, class_labels):
    global PREDICTOR_NETWORK
    from luminoth_tpu.utils.predicting import PredictorNetwork

    network = PredictorNetwork(config, class_labels=class_labels)
    if BATCH_SIZE > 1:
        # Coalesce concurrent requests into one device forward.
        from luminoth_tpu.utils.serving import MicroBatcher

        network = MicroBatcher(
            network, max_batch=BATCH_SIZE, max_wait_ms=BATCH_WAIT_MS
        )
    PREDICTOR_NETWORK = network
    logger.info("Model loaded and ready to serve.")


class Handler(BaseHTTPRequestHandler):
    model_name = "model"

    def _send_json(self, payload, status=200):
        body = json.dumps(payload).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            try:
                with open(_template_path(), "rb") as f:
                    body = f.read()
            except OSError:
                body = b"<html><body>luminoth-tpu server</body></html>"
            body = body.replace(
                b"{{ model_name }}", self.model_name.encode()
            )
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self._send_json({"error": "not found"}, status=404)

    def do_POST(self):
        if not self.path.startswith("/api/") or "/predict" not in self.path:
            self._send_json({"error": "not found"}, status=404)
            return

        content_type = self.headers.get("Content-Type", "")
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        image_bytes = None
        params = {}
        if content_type.startswith("multipart/form-data"):
            image_bytes, params = _parse_multipart(body, content_type)
        else:
            image_bytes = body

        if not image_bytes:
            self._send_json({"error": "missing image"}, status=400)
            return

        try:
            from PIL import Image

            image = np.asarray(
                Image.open(io.BytesIO(image_bytes)).convert("RGB")
            )
        except Exception:
            self._send_json({"error": "incorrect image format"}, status=400)
            return

        # Wait for the model to finish loading (web.py:51).
        if NETWORK_START_THREAD is not None:
            NETWORK_START_THREAD.join()
        if PREDICTOR_NETWORK is None:
            self._send_json({"error": "model failed to load"}, status=500)
            return

        # Malformed form fields must come back as HTTP errors, not a
        # dropped connection (an uncaught exception in do_POST closes
        # the socket with no response written).
        try:
            min_prob = float(params.get("min_prob", 0) or 0)
            total = int(params["total"]) if params.get("total") else None
        except (TypeError, ValueError):
            self._send_json(
                {"error": "min_prob/total must be numeric"}, status=400
            )
            return

        try:
            objects = PREDICTOR_NETWORK.predict_image(image)
        except Exception as exc:  # surface predict errors as HTTP 500
            logger.exception("predict failed")
            self._send_json(
                {"error": f"prediction failed: {exc}"}, status=500
            )
            return
        # No server-side floor by default: the frontend slider filters
        # client-side (reference web.py:96-104 ships every detection
        # above the forced 0.01 config threshold). API callers can pass
        # a min_prob form field to filter server-side.
        if min_prob:
            objects = [o for o in objects if o["prob"] >= min_prob]
        if total is not None:
            objects = objects[:total]
        self._send_json({"objects": objects})

    def log_message(self, fmt, *args):
        logger.debug("%s - %s", self.address_string(), fmt % args)


def run_server(config, class_labels=None, host="127.0.0.1", port=5000,
               block=True):
    """Start the demo server; returns the server object."""
    global NETWORK_START_THREAD
    # Initialize the JAX backend on the main thread before the loader
    # thread touches it: PJRT client creation can hang when first driven
    # from a secondary thread (see utils/tunnel.py).
    try:
        import jax

        jax.devices()
    except Exception:  # pragma: no cover - surfaces in start_network
        pass
    NETWORK_START_THREAD = threading.Thread(
        target=start_network, args=(config, class_labels), daemon=True
    )
    NETWORK_START_THREAD.start()

    Handler.model_name = config.model.type
    httpd = ThreadingHTTPServer((host, port), Handler)
    logger.info("Serving on http://%s:%d", host, port)
    if block:
        httpd.serve_forever()
    else:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


@click.command(help="Start basic web application.")
@click.option(
    "config_files", "--config", "-c", multiple=True, help="Config to use.")
@click.option("--checkpoint", help="Checkpoint to use.")
@click.option(
    "override_params", "--override", "-o", multiple=True,
    help="Override model config params.")
@click.option("--host", default="127.0.0.1", help="Hostname to listen on.")
@click.option("--port", default=5000, type=int, help="Port to listen to.")
@click.option(
    "--batch-size", default=8, type=int,
    help="Coalesce up to this many concurrent requests per device "
         "forward (1 disables batching).")
@click.option(
    "--batch-wait-ms", default=2.0, type=float,
    help="How long to wait for more requests to join a batch.")
@click.option(
    "--profile", default="accurate",
    type=click.Choice(["accurate", "fast"]),
    help="Serving profile: 'fast' = uint8 transfer + 6000/1000 proposal "
         "budget (measured 62 vs 34 img/s on v5e; see "
         "utils/serving.py:apply_serving_profile).")
@click.option("--debug", is_flag=True, help="Set debug level logging.")
def web(config_files, checkpoint, override_params, host, port, batch_size,
        batch_wait_ms, profile, debug):
    logging.basicConfig(level=logging.DEBUG if debug else logging.INFO)
    global BATCH_SIZE, BATCH_WAIT_MS
    BATCH_SIZE = batch_size
    BATCH_WAIT_MS = batch_wait_ms

    if config_files:
        from luminoth_tpu.utils.config import get_config

        config = get_config(list(config_files))
        class_labels = None
    else:
        from luminoth_tpu.tools.checkpoint import (
            get_checkpoint_config,
            get_checkpoint_class_labels,
        )

        name = checkpoint or "accurate"
        if not checkpoint:
            click.echo(
                "Neither checkpoint not config specified, assuming "
                "`accurate`."
            )
        config = get_checkpoint_config(name)
        class_labels = get_checkpoint_class_labels(name)

    if override_params:
        from luminoth_tpu.utils.config import override_config_params

        config = override_config_params(config, override_params)

    from luminoth_tpu.utils.serving import apply_serving_profile

    config = apply_serving_profile(config, profile)

    # Force a low min-prob so the frontend slider can filter client-side
    # (reference web.py:96-104).
    if config.model.type == "fasterrcnn":
        config.model.rcnn.proposals.min_prob_threshold = MIN_PROB_FOR_FRONTEND
    else:
        config.model.proposals.min_prob_threshold = MIN_PROB_FOR_FRONTEND

    run_server(config, class_labels=class_labels, host=host, port=port)
