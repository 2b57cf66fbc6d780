"""Declarative contract runner — drives testdata/contracts.json against a
live server (SURVEY §4.6: the same contract file is executed by every
client; the TypeScript SDK replays it in its own test harness)."""

import json
import os

import pytest
import requests

from test_http import ServerFixture

CONTRACTS = os.path.join(os.path.dirname(__file__), "..", "testdata",
                         "contracts.json")


@pytest.fixture(scope="module")
def srv():
    s = ServerFixture()
    yield s
    s.stop()


def load_steps():
    with open(CONTRACTS) as f:
        return json.load(f)["steps"]


@pytest.mark.parametrize("step", load_steps(), ids=lambda s: s["id"])
def test_contract(step, srv):
    url = srv.base + step["path"]
    kw = {}
    if "body" in step:
        kw["json"] = step["body"]
    elif "raw_body" in step:
        kw["data"] = step["raw_body"].encode()
    r = requests.request(step["method"], url, timeout=60, **kw)
    assert r.status_code == step["expect_status"], \
        f"{step['id']}: got {r.status_code}, body={r.text[:200]}"
    if r.status_code == 204 or not r.content:
        return
    data = r.json() if "json" in r.headers.get("Content-Type", "") else None
    if data is None:
        return
    if step.get("expect_type") == "array":
        assert isinstance(data, list)
        return
    for f in step.get("expect_fields", []):
        assert f in data, f"{step['id']}: missing field {f}"
    for k, v in (step.get("expect_equals") or {}).items():
        assert data.get(k) == v, f"{step['id']}: {k}={data.get(k)!r} != {v!r}"
    if "expect_contains_name" in step:
        assert any(i.get("name") == step["expect_contains_name"]
                   for i in data)
    if step.get("expect_ids_b64_count_matches_shape"):
        # the ids blob must decode to exactly shape[0]*shape[1] rows —
        # this is the assertion that catches the next wire change
        import base64
        flat = base64.b64decode(data["ids_b64"]).decode().split("\n")
        want = data["shape"][0] * data["shape"][1]
        assert len(flat) == want, \
            f"{step['id']}: ids_b64 decoded to {len(flat)} ids, want {want}"
    if "expect_first_id" in step:
        assert data["ids"][0] == step["expect_first_id"]
    if "expect_ids_subset" in step:
        assert set(data["ids"]) <= set(step["expect_ids_subset"])
