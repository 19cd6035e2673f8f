# SPDX-License-Identifier: Apache-2.0
"""Minimal OpenAI-completions-style HTTP server over the serving engine.

The reference points serving users at vLLM's API server (reference
README.md:171-196); this is the stdlib-only TPU-native analogue running the
ContinuousBatchingEngine (paged KV + prefix caching) behind a thread-safe
request queue. Token-id in, token-id out (bring your own tokenizer):

    POST /v1/completions
      {"prompt_tokens": [1, 2, 3], "max_tokens": 32, "temperature": 0.0}
    -> {"id": ..., "output_tokens": [...], "finish_reason": "length",
        "ttft_s": ..., "decode_tps": ...}

    GET /v1/stats -> engine stats() JSON

Usage: python examples/api_server.py [--port 8055] [--slots 4]
"""
import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import _pathfix  # noqa: F401
import numpy as np


class EngineService:
    """Thread-safe facade: callers submit and block; one background thread
    steps the engine and resolves waiters as requests finish."""

    def __init__(self, engine):
        from gemlite_tpu.serving import Request

        self._Request = Request
        self.engine = engine
        self._lock = threading.Lock()
        self._waiters = {}            # request_id -> [threading.Event, result]
        self._error = None            # fatal engine error: service is dead
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        import time as _t

        while not self._stop:
            with self._lock:
                busy = self.engine.queue or self.engine.num_active
                if busy:
                    try:
                        self.engine.step()
                    except Exception as e:  # engine state may be corrupt:
                        # fail every waiter instead of dying silently
                        self._error = e
                        for w in self._waiters.values():
                            w[1] = e
                            w[0].set()
                        self._waiters.clear()
                        return
                    for r in self.engine.finished:
                        w = self._waiters.pop(r.request_id, None)
                        if w is not None:
                            w[1] = r
                            w[0].set()
                    self.engine.finished.clear()
            if not busy:
                _t.sleep(0.005)

    def complete(self, prompt_tokens, max_tokens, temperature, timeout=300.0):
        if self._error is not None:
            raise RuntimeError(f"engine failed: {self._error}")
        req = self._Request(prompt_tokens=list(map(int, prompt_tokens)),
                            max_new_tokens=int(max_tokens),
                            temperature=float(temperature))
        waiter = [threading.Event(), None]
        with self._lock:
            if self._error is not None:
                # the stepping thread died while we waited for the lock:
                # registering a waiter now would hang until timeout
                raise RuntimeError(f"engine failed: {self._error}")
            # submit first: a rejected prompt must not leak a waiter entry
            self.engine.submit(req)
            self._waiters[req.request_id] = waiter
        try:
            if not waiter[0].wait(timeout):
                raise TimeoutError("generation timed out")
        finally:
            with self._lock:
                self._waiters.pop(req.request_id, None)
        if isinstance(waiter[1], Exception):
            raise RuntimeError(f"engine failed: {waiter[1]}")
        return waiter[1]

    def stats(self):
        with self._lock:
            return self.engine.stats()

    def shutdown(self):
        self._stop = True
        self._thread.join(timeout=5)


def make_handler(service: EngineService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/v1/stats":
                return self._json(200, service.stats())
            return self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/completions":
                return self._json(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                toks = req["prompt_tokens"]
                r = service.complete(
                    toks, req.get("max_tokens", 32),
                    req.get("temperature", 0.0))
                return self._json(200, {
                    "id": r.request_id,
                    "output_tokens": [int(t) for t in r.output_tokens],
                    "finish_reason": r.finish_reason,
                    "ttft_s": r.ttft_s,
                    "decode_tps": r.decode_tps,
                })
            except (KeyError, ValueError, TypeError) as e:
                return self._json(400, {"error": str(e)})
            except Exception as e:  # engine-side failures
                return self._json(500, {"error": str(e)})

    return Handler


def build_service(slots=4, seed=0):
    from gemlite_tpu.models import LlamaConfig, init_llama, quantize_llama
    from gemlite_tpu.serving import ContinuousBatchingEngine

    cfg = LlamaConfig.tiny(vocab_size=2048, hidden_size=512,
                           intermediate_size=1408, num_layers=4, num_heads=8,
                           num_kv_heads=4, head_dim=64, max_seq_len=256)
    params = quantize_llama(init_llama(cfg, seed=seed), W_nbits=4,
                            group_size=64)
    eng = ContinuousBatchingEngine(params, cfg, max_batch=slots,
                                   prefill_buckets=(16, 32, 64, 128),
                                   page_size=32)
    return EngineService(eng)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8055)
    ap.add_argument("--slots", type=int, default=4)
    args = ap.parse_args()

    service = build_service(slots=args.slots)
    srv = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(service))
    print(f"# serving on http://127.0.0.1:{args.port}/v1/completions")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        service.shutdown()


if __name__ == "__main__":
    main()
