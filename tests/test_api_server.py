# SPDX-License-Identifier: Apache-2.0
"""HTTP API server example: end-to-end over a live socket (CPU).

Outputs must match direct engine generation (same seed/greedy), concurrent
requests must all resolve, and /v1/stats must serve engine metrics."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from gemlite_tpu.models import LlamaConfig, init_llama, quantize_llama
from gemlite_tpu.serving import ContinuousBatchingEngine

pytestmark = pytest.mark.slow  # mesh/serving heavyweight (deselect: -m 'not slow')


@pytest.fixture(scope="module")
def server():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from api_server import EngineService, make_handler

    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=2, head_dim=32, max_seq_len=64)
    params = quantize_llama(init_llama(cfg, seed=0), W_nbits=4, group_size=32)

    def make_engine():
        return ContinuousBatchingEngine(params, cfg, max_batch=2,
                                        prefill_buckets=(8, 16, 32),
                                        page_size=8)

    service = EngineService(make_engine())
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], make_engine
    srv.shutdown()
    service.shutdown()


def _post(port, path, obj, timeout=300):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_completion_matches_engine(server):
    port, make_engine = server
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 128, size=9).tolist()

    want = make_engine().generate([prompt], max_new_tokens=5)[0]
    got = _post(port, "/v1/completions",
                {"prompt_tokens": prompt, "max_tokens": 5})
    assert got["output_tokens"] == want
    assert got["finish_reason"] in ("eos", "length")
    assert got["ttft_s"] > 0


def test_concurrent_requests_and_stats(server):
    port, make_engine = server
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 128, size=5 + i).tolist() for i in range(4)]
    want = make_engine().generate(prompts, max_new_tokens=4)

    results = [None] * len(prompts)

    def call(i):
        results[i] = _post(port, "/v1/completions",
                           {"prompt_tokens": prompts[i], "max_tokens": 4})

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, r in enumerate(results):
        assert r is not None and r["output_tokens"] == want[i], (i, r)

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/stats", timeout=60) as r:
        stats = json.loads(r.read())
    assert stats["tokens_out"] >= sum(len(w) for w in want)


def test_bad_request(server):
    port, _ = server
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, "/v1/completions", {"max_tokens": 4})
    assert ei.value.code == 400


def test_rejected_prompt_does_not_leak_waiters_or_kill_service(server):
    """A submit-time rejection (empty prompt) returns 400, leaves no waiter
    entry behind, and the service keeps completing valid requests."""
    port, make_engine = server
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, "/v1/completions", {"prompt_tokens": [], "max_tokens": 4})
    assert ei.value.code == 400

    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 128, size=6).tolist()
    want = make_engine().generate([prompt], max_new_tokens=3)[0]
    got = _post(port, "/v1/completions",
                {"prompt_tokens": prompt, "max_tokens": 3})
    assert got["output_tokens"] == want
