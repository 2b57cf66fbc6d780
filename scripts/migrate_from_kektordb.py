#!/usr/bin/env python3
"""Migrate data from a running KektorDB (Go) server into KektorDB-TPU.

Stdlib-only (urllib): pages the source's paginated export endpoint
(GET /vector/indexes/{name}/export — internal/server/http_handlers.go:2421;
the Go server's pages carry id + metadata only, wrapped as
{"data", "has_more", "next_offset"}), hydrates the raw vectors via
POST /vector/actions/get-vectors ([{id, vector, metadata}], core.go:60-64)
when a page lacks them, recreates the index on the destination, and
bulk-loads via POST /vector/actions/add-batch. With --edges it also
walks each migrated node's outgoing relations
(POST /graph/actions/get-all-relations → {relations: {rel: [targets]}})
and re-links them on the destination — both servers speak the same wire,
so no translation is needed (the script equally accepts KektorDB-TPU's
export shape, so TPU→TPU moves work too).

The two AOF/snapshot formats are NOT interchangeable (gob/text vs
CRC-framed msgpack/npz); live HTTP export→import is the supported path.
See MIGRATION.md for the full guide.

Usage:
  python scripts/migrate_from_kektordb.py \
      --source http://old-host:9091 --dest http://new-host:9091 \
      --index documents [--dest-index documents] [--batch 1024] \
      [--metric cosine --precision float32] [--edges] \
      [--source-token T] [--dest-token T]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.error
import urllib.parse
import urllib.request


def _call(base: str, path: str, token: str | None, body=None,
          method: str | None = None):
    url = base.rstrip("/") + path
    data = None
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    if body is not None:
        data = json.dumps(body).encode()
    req = urllib.request.Request(
        url, data=data, headers=headers,
        method=method or ("POST" if body is not None else "GET"))
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read() or b"{}")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--source", required=True,
                    help="base URL of the running KektorDB (Go) server")
    ap.add_argument("--dest", required=True,
                    help="base URL of the running KektorDB-TPU server")
    ap.add_argument("--index", required=True, help="source index name")
    ap.add_argument("--dest-index", default=None,
                    help="destination index name (default: same)")
    ap.add_argument("--batch", type=int, default=1024,
                    help="rows per export page / add-batch request")
    ap.add_argument("--metric", default=None,
                    help="destination metric (default: copy source's)")
    ap.add_argument("--precision", default=None,
                    help="destination precision (float32|bfloat16|int8)")
    ap.add_argument("--shards", type=int, default=0,
                    help="row-shard the destination over N chips")
    ap.add_argument("--edges", action="store_true",
                    help="also migrate each node's outgoing graph edges")
    ap.add_argument("--source-token", default=None)
    ap.add_argument("--dest-token", default=None)
    ap.add_argument("--skip-create", action="store_true",
                    help="destination index already exists")
    args = ap.parse_args()
    dest_index = args.dest_index or args.index

    # source index config (metric/precision carry over unless overridden)
    try:
        info = _call(args.source, f"/vector/indexes/"
                     f"{urllib.parse.quote(args.index)}",
                     args.source_token)
    except urllib.error.HTTPError as e:
        print(f"source index lookup failed: {e}", file=sys.stderr)
        return 1
    metric = args.metric or info.get("metric") \
        or info.get("config", {}).get("metric") or "euclidean"
    precision = args.precision or info.get("precision") \
        or info.get("config", {}).get("precision") or "float32"

    if not args.skip_create:
        try:
            _call(args.dest, "/vector/actions/create", args.dest_token,
                  {"index_name": dest_index, "metric": metric,
                   "precision": precision,
                   **({"shards": args.shards} if args.shards else {})})
            print(f"created {dest_index} ({metric}/{precision}"
                  f"{f'/shards={args.shards}' if args.shards else ''})")
        except urllib.error.HTTPError as e:
            if e.code != 409:
                raise
            print(f"{dest_index} already exists on destination; reusing")

    moved = 0
    offset = 0
    ids_all: list[str] = []
    t0 = time.time()
    while True:
        page = _call(args.source,
                     f"/vector/indexes/{urllib.parse.quote(args.index)}"
                     f"/export?limit={args.batch}&offset={offset}",
                     args.source_token)
        # Go wire: {"data": [...], "has_more", "next_offset"};
        # TPU wire: {"vectors": [...], "total", "offset", "limit"}
        items = page.get("data") or page.get("vectors") or []
        if not items:
            break
        missing = [it["id"] for it in items if not it.get("vector")]
        if missing:
            # Go export pages carry no vectors — hydrate them in batch
            hyd = _call(args.source, "/vector/actions/get-vectors",
                        args.source_token,
                        {"index_name": args.index, "ids": missing})
            by_id = {v["id"]: v for v in
                     (hyd if isinstance(hyd, list)
                      else hyd.get("data") or [])}
            for it in items:
                got = by_id.get(it["id"])
                if got and got.get("vector"):
                    it["vector"] = got["vector"]
                    it.setdefault("metadata", got.get("metadata"))
        vecs = [it for it in items if it.get("vector")]
        if vecs:
            _call(args.dest, "/vector/actions/add-batch", args.dest_token,
                  {"index_name": dest_index,
                   "vectors": [{"id": it["id"], "vector": it["vector"],
                                "metadata": it.get("metadata") or {}}
                               for it in vecs]})
        moved += len(vecs)
        ids_all.extend(it["id"] for it in items)
        offset = page.get("next_offset", offset + len(items))
        total = page.get("total") or page.get("total_count")
        print(f"\r{moved} vectors moved"
              f"{f' / {total}' if total else ''}…", end="", flush=True)
        if not page.get("has_more", len(items) >= args.batch):
            break
    print(f"\n{moved} vectors migrated in {time.time() - t0:.1f}s")

    if args.edges:
        n_edges = 0
        for i, node in enumerate(ids_all):
            rel = _call(args.source, "/graph/actions/get-all-relations",
                        args.source_token,
                        {"index_name": args.index, "node_id": node})
            for rtype, targets in (rel.get("relations") or {}).items():
                for tgt in targets:
                    _call(args.dest, "/graph/actions/link",
                          args.dest_token,
                          {"index_name": dest_index, "source_id": node,
                           "relation_type": rtype, "target_id": tgt})
                    n_edges += 1
            if i % 200 == 0:
                print(f"\r{n_edges} edges moved ({i}/{len(ids_all)} "
                      "nodes walked)…", end="", flush=True)
        print(f"\n{n_edges} edges migrated")

    _call(args.dest, "/system/save", args.dest_token, {})
    print("destination snapshot saved — migration complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
