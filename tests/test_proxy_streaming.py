"""AI Gateway streaming passthrough + proxy.yaml config.

Reference: pkg/proxy/proxy.go:385 (streaming detection/forwarding — chunks
relay as they arrive, no buffering) and config_loader.go:103 (proxy.yaml).
The fake upstream emits SSE chunks with deliberate gaps; the test asserts
the first chunk reaches the client before the upstream has finished."""

import asyncio
import json
import threading
import time

import pytest
import requests

from kektordb_tpu.engine import Engine, EngineConfig
from kektordb_tpu.services.embeddings import HashingEmbedder
from kektordb_tpu.services.proxy import AIGateway, ProxyConfig, \
    make_gateway_app

CHUNK_GAP = 0.15
N_CHUNKS = 3


class _Loop:
    """Run upstream + gateway aiohttp apps on one background loop."""

    def __init__(self):
        self.loop = asyncio.new_event_loop()
        self.started = threading.Event()
        self.upstream_port = None
        self.gateway_port = None
        self.upstream_done_at = None
        t = threading.Thread(target=self._run, daemon=True)
        t.start()
        assert self.started.wait(20)

    def _run(self):
        from aiohttp import web
        asyncio.set_event_loop(self.loop)

        async def upstream_chat(request):
            body = await request.json()
            if body.get("stream"):
                resp = web.StreamResponse()
                resp.content_type = "text/event-stream"
                await resp.prepare(request)
                for i in range(N_CHUNKS):
                    chunk = {"choices": [{"delta": {"content": f"tok{i} "}}]}
                    await resp.write(
                        f"data: {json.dumps(chunk)}\n\n".encode())
                    await asyncio.sleep(CHUNK_GAP)
                await resp.write(b"data: [DONE]\n\n")
                self.upstream_done_at = time.time()
                return resp
            return web.json_response({
                "id": "up-1", "object": "chat.completion",
                "choices": [{"index": 0, "finish_reason": "stop",
                             "message": {"role": "assistant",
                                         "content": "plain answer"}}]})

        async def upstream_models(request):
            return web.json_response({"data": [{"id": "fake-model"}]})

        async def start():
            up = web.Application()
            up.router.add_post("/v1/chat/completions", upstream_chat)
            up.router.add_get("/v1/models", upstream_models)
            runner = web.AppRunner(up)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            self.upstream_port = site._server.sockets[0].getsockname()[1]

            engine = Engine(EngineConfig(start_background=False)).open()
            gw = AIGateway(engine, HashingEmbedder(), ProxyConfig(
                upstream_url=f"http://127.0.0.1:{self.upstream_port}/v1",
                cache_enabled=True))
            self.gateway = gw
            app = make_gateway_app(gw)
            grunner = web.AppRunner(app)
            await grunner.setup()
            gsite = web.TCPSite(grunner, "127.0.0.1", 0)
            await gsite.start()
            self.gateway_port = gsite._server.sockets[0].getsockname()[1]
            self.started.set()

        self.loop.run_until_complete(start())
        self.loop.run_forever()


@pytest.fixture(scope="module")
def stack():
    return _Loop()


def test_streaming_passes_through_unbuffered(stack):
    url = f"http://127.0.0.1:{stack.gateway_port}/v1/chat/completions"
    t0 = time.time()
    first_chunk_at = None
    chunks = []
    with requests.post(url, json={
            "model": "m", "stream": True,
            "messages": [{"role": "user", "content": "stream please"}]},
            stream=True, timeout=30) as r:
        assert r.status_code == 200
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r.iter_lines():
            if line:
                if first_chunk_at is None:
                    first_chunk_at = time.time()
                chunks.append(line.decode())
    total = time.time() - t0
    # all chunks relayed
    assert sum(1 for c in chunks if c.startswith("data:")) == N_CHUNKS + 1
    assert any("tok0" in c for c in chunks)
    assert chunks[-1] == "data: [DONE]"
    # unbuffered: the first chunk arrived well before the upstream finished
    # (upstream takes N_CHUNKS * CHUNK_GAP ~ 450ms to complete)
    assert first_chunk_at - t0 < total - CHUNK_GAP


def test_streaming_skips_cache(stack):
    url = f"http://127.0.0.1:{stack.gateway_port}/v1/chat/completions"
    body = {"model": "m", "stream": True,
            "messages": [{"role": "user", "content": "cached? never"}]}
    with requests.post(url, json=body, stream=True, timeout=30) as r:
        list(r.iter_lines())
    with requests.post(url, json=body, stream=True, timeout=30) as r:
        text = b"\n".join(r.iter_lines()).decode()
    assert "kektordb_cache" not in text     # second call not served by cache


def test_non_stream_cached_second_time(stack):
    url = f"http://127.0.0.1:{stack.gateway_port}/v1/chat/completions"
    body = {"model": "m",
            "messages": [{"role": "user", "content": "what is kektordb"}]}
    r1 = requests.post(url, json=body, timeout=30).json()
    assert r1["choices"][0]["message"]["content"] == "plain answer"
    r2 = requests.post(url, json=body, timeout=30).json()
    assert r2.get("kektordb_cache") == "hit"
    assert r2["usage"]["total_tokens"] == 0


def test_models_passthrough(stack):
    r = requests.get(
        f"http://127.0.0.1:{stack.gateway_port}/v1/models", timeout=10)
    assert r.status_code == 200
    assert r.json()["data"][0]["id"] == "fake-model"


def test_proxy_yaml_loader(tmp_path, monkeypatch):
    p = tmp_path / "proxy.yaml"
    p.write_text("""
upstream_url: http://up:9/v1
firewall:
  enabled: true
  threshold: 0.7
cache:
  enabled: false
  ttl: 120
deny_list: [secret, password]
""")
    cfg = ProxyConfig.from_yaml(str(p))
    assert cfg.upstream_url == "http://up:9/v1"
    assert cfg.firewall_enabled is True
    assert cfg.firewall_threshold == 0.7
    assert cfg.cache_enabled is False
    assert cfg.cache_ttl == 120
    assert cfg.deny_list == ["secret", "password"]
    monkeypatch.setenv("KEKTOR_PROXY_RAG_ENABLED", "true")
    monkeypatch.setenv("KEKTOR_PROXY_RAG_K", "9")
    cfg = ProxyConfig.from_yaml(str(p))
    assert cfg.rag_enabled is True and cfg.rag_k == 9
