"""Model-server tests (adunet/cli/serve.py).

Drives the real ThreadingHTTPServer over a real exported artifact through
actual HTTP sockets: health/metadata, single-image and stacked predict
round-trips (outputs must equal the direct artifact call), micro-batching
of concurrent rows into one device dispatch, and 400s on malformed input.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from adunet.cli.serve import make_server
    from adunet.export import export_sr_forward, save_artifact
    from adunet.models import build_super_resolution_unet
    from adunet.train import create_train_state, make_optimizer

    model, info = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=32, base_channels=8,
        residual_head_channels=8,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 32, 32, 3)), make_optimizer(1e-4)
    )
    # identity-start would make the served forward == clip(input): an
    # echo-server bug would then pass every predict round-trip. Perturb the
    # params so the comparisons require the real network to have run.
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(jax.random.key(7), len(leaves))
    state = state.replace(params=jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    ))
    exported = export_sr_forward(state, patch_size=32, batch_size=4, platforms=("cpu",))
    art = save_artifact(
        exported, tmp_path_factory.mktemp("srv") / "artifact", meta={"scale": 0.5}
    )

    server = make_server(str(art), port=0, batch_window_ms=200.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def reference(x):
        return np.clip(np.asarray(model.apply({"params": state.params}, x)), 0.0, 1.0)

    yield base, server, reference
    server.shutdown()
    server.batcher.close()
    server.server_close()


def _post_npy(url, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(
        url, data=buf.getvalue(), headers={"Content-Type": "application/octet-stream"}
    )
    with urllib.request.urlopen(req) as resp:
        return np.load(io.BytesIO(resp.read()))


def test_health_and_metadata(served):
    base, _, _ = served
    with urllib.request.urlopen(base + "/v1/health") as r:
        assert json.load(r)["status"] == "ok"
    with urllib.request.urlopen(base + "/v1/metadata") as r:
        meta = json.load(r)
    assert meta["manifest"]["input_shape"] == [4, 32, 32, 3]
    assert "device_calls" in meta["serving"]


def test_predict_single_image_matches_direct_call(served):
    base, _, reference = served
    x = np.random.default_rng(0).random((32, 32, 3), dtype=np.float32)
    out = _post_npy(base + "/v1/predict", x)
    assert out.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(out[0], reference(x[None])[0], atol=1e-6)


def test_predict_stack_is_microbatched_into_one_dispatch(served):
    base, server, reference = served
    calls_before = server.batcher.stats["device_calls"]
    x = np.random.default_rng(1).random((3, 32, 32, 3), dtype=np.float32)
    out = _post_npy(base + "/v1/predict", x)
    np.testing.assert_allclose(out, reference(x), atol=1e-6)
    # 3 rows + zero-padding to the static batch of 4 -> exactly ONE dispatch
    assert server.batcher.stats["device_calls"] == calls_before + 1


def test_predict_uint8_normalised_like_training_feed(served):
    base, _, reference = served
    x8 = (np.random.default_rng(2).random((32, 32, 3)) * 255).astype(np.uint8)
    out = _post_npy(base + "/v1/predict", x8)
    np.testing.assert_allclose(
        out[0], reference((x8.astype(np.float32) / 255.0)[None])[0], atol=1e-6
    )


def test_predict_rejects_empty_stack(served):
    base, _, _ = served
    buf = io.BytesIO()
    np.save(buf, np.zeros((0, 32, 32, 3), np.float32))
    req = urllib.request.Request(base + "/v1/predict", data=buf.getvalue())
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req)
    assert err.value.code == 400  # a crash here would drop the connection


def test_predict_rejects_wrong_shape(served):
    base, _, _ = served
    buf = io.BytesIO()
    np.save(buf, np.zeros((16, 16, 3), np.float32))
    req = urllib.request.Request(base + "/v1/predict", data=buf.getvalue())
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req)
    assert err.value.code == 400
    assert "expected (32, 32, 3)" in json.loads(err.value.read())["error"]


def test_concurrent_requests_share_batches(served):
    base, server, reference = served
    xs = np.random.default_rng(3).random((8, 32, 32, 3), dtype=np.float32)
    calls_before = server.batcher.stats["device_calls"]
    results = [None] * 8
    threads = [
        threading.Thread(
            target=lambda i=i: results.__setitem__(
                i, _post_npy(base + "/v1/predict", xs[i])
            )
        )
        for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    for i in range(8):
        np.testing.assert_allclose(results[i][0], reference(xs[i : i + 1])[0], atol=1e-6)
    # 8 one-image requests into a static batch of 4 cannot take more than 8
    # dispatches, and the 200 ms window makes fewer overwhelmingly likely;
    # assert the hard upper bound only (timing-robust).
    assert server.batcher.stats["device_calls"] - calls_before <= 8


def test_predict_rejects_oversized_body(served):
    """Bodies above --max-body-mb must get a 413, not a multi-GB decode.
    The cap is enforced from the Content-Length header BEFORE reading the
    body, so the test only has to claim a huge body, not ship one."""
    import http.client

    base, server, _ = served
    conn = http.client.HTTPConnection("127.0.0.1", server.server_address[1], timeout=10)
    try:
        conn.putrequest("POST", "/v1/predict")
        conn.putheader("Content-Length", str(65 * 1024 * 1024))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        assert "limit" in json.loads(resp.read())["error"]
    finally:
        conn.close()


def test_predict_rejects_malformed_content_length(served):
    """A non-integer Content-Length header must produce a clean 400, not a
    dropped connection from an uncaught ValueError."""
    import http.client

    base, server, _ = served
    conn = http.client.HTTPConnection("127.0.0.1", server.server_address[1], timeout=10)
    try:
        conn.putrequest("POST", "/v1/predict")
        conn.putheader("Content-Length", "abc")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert "Content-Length" in json.loads(resp.read())["error"]
    finally:
        conn.close()


def test_predict_saturation_returns_503(tmp_path):
    """Beyond --max-concurrent-requests, predict must be refused with a 503
    immediately — ThreadingHTTPServer has no connection cap of its own, so
    without admission control a client burst holds an unbounded number of
    decoded bodies in server RAM."""
    import time
    import urllib.error

    import jax
    import jax.numpy as jnp

    from adunet.cli.serve import make_server
    from adunet.export import export_sr_forward, save_artifact
    from adunet.models import build_super_resolution_unet
    from adunet.train import create_train_state, make_optimizer

    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=32, base_channels=8,
        residual_head_channels=8,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 32, 32, 3)), make_optimizer(1e-4)
    )
    exported = export_sr_forward(state, patch_size=32, batch_size=4, platforms=("cpu",))
    art = save_artifact(exported, tmp_path / "sat", meta={})

    # one admission slot; the 1 s batch window keeps a single-image request
    # (1 row in a batch of 4) holding that slot long enough to observe
    server = make_server(str(art), port=0, batch_window_ms=1000.0,
                         max_concurrent_requests=1)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        x = np.random.default_rng(4).random((32, 32, 3), dtype=np.float32)
        first = {}
        t = threading.Thread(target=lambda: first.update(out=_post_npy(base + "/v1/predict", x)))
        t.start()
        # wait until the first request is ADMITTED (counted), not just sent
        deadline = time.monotonic() + 10
        while server.batcher.snapshot_stats()["requests"] < 1:
            assert time.monotonic() < deadline, "first request never admitted"
            time.sleep(0.01)
        with pytest.raises(urllib.error.HTTPError) as err:
            _post_npy(base + "/v1/predict", x)
        assert err.value.code == 503
        assert "saturated" in json.loads(err.value.read())["error"]
        t.join(timeout=30)
        assert first["out"].shape == (1, 32, 32, 3)  # admitted request unaffected
        # the slot frees once the first request completes: admitted again
        assert _post_npy(base + "/v1/predict", x).shape == (1, 32, 32, 3)
    finally:
        server.shutdown()
        server.batcher.close()
        server.server_close()


def test_submit_after_close_fails_fast():
    """_Batcher.submit racing close() must raise immediately instead of
    stranding a future no worker or drain will ever resolve."""
    from adunet.cli.serve import _Batcher

    b = _Batcher(lambda x: x, batch_size=2, window_ms=1.0)
    b.close()
    with pytest.raises(RuntimeError):
        b.submit(np.zeros((2, 2, 3), np.float32))


def test_make_server_requires_manifest_input_shape(tmp_path):
    """A bare model.stablehlo directory (no manifest) must fail at startup
    with a message naming the problem, not a KeyError."""
    from adunet.cli.serve import make_server

    art = tmp_path / "bare"
    art.mkdir()
    (art / "model.stablehlo").write_bytes(b"not a real program")
    with pytest.raises(Exception) as exc_info:
        make_server(str(art), port=0)
    # either load_artifact rejects the bogus program or make_server rejects
    # the missing manifest — both must be explicit, never a KeyError
    assert not isinstance(exc_info.value, KeyError)


def test_serve_int8_artifact_round_trip(tmp_path):
    """The server over an int8 weight-only artifact (manifest + external
    weights.npz, the multi-input program path) must return the quantized
    program's outputs — exercising _Batcher + load_artifact's weight
    re-binding together, which no other test combines."""
    import jax
    import jax.numpy as jnp

    from adunet.cli.serve import make_server
    from adunet.export import export_sr_forward, load_artifact, save_artifact
    from adunet.models import build_super_resolution_unet
    from adunet.train import create_train_state, make_optimizer

    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=32, base_channels=8,
        residual_head_channels=8,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 32, 32, 3)), make_optimizer(1e-4)
    )
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(jax.random.key(5), len(leaves))
    state = state.replace(params=jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    ))
    exported = export_sr_forward(
        state, patch_size=32, batch_size=2, platforms=("cpu",), quantize="int8"
    )
    art = save_artifact(exported, tmp_path / "int8", meta={"quantization": "int8-weight-only"})

    call, _manifest = load_artifact(art)
    server = make_server(str(art), port=0, batch_window_ms=50.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        x = np.random.default_rng(3).random((32, 32, 3), dtype=np.float32)
        got = _post_npy(f"{base}/v1/predict", x)
        assert got.shape == (1, 32, 32, 3)
        want = np.asarray(call(np.asarray(x)[None].repeat(2, axis=0)))[0]
        np.testing.assert_allclose(got[0], want, atol=1e-6)
    finally:
        server.shutdown()
        server.batcher.close()
        server.server_close()
