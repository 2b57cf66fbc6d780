"""Terminal dashboard (curses).

Reference: internal/tui — Bubble Tea v2 dashboard with 5 tabs
(dashboard / graph / search / timeline / settings) fed by the HTTP API and
the SSE event stream. This is the Python/curses equivalent, launched with
`python -m kektordb_tpu.client.tui [base_url]`.

Keys: 1-5 switch tabs, r refresh, / focus search input, q quit.
"""

from __future__ import annotations

import curses
import json
import queue
import threading
import time
from typing import Optional

from .client import KektorDBClient, KektorDBError

TABS = ["Dashboard", "Graph", "Search", "Timeline", "Settings"]


class EventTail:
    """SSE tail of /events/stream feeding the Timeline tab."""

    def __init__(self, base_url: str):
        self.base_url = base_url
        self.events: queue.Queue = queue.Queue(maxsize=500)
        self.items: list[dict] = []
        t = threading.Thread(target=self._run, daemon=True)
        t.start()

    def _run(self) -> None:
        import requests
        while True:
            try:
                with requests.get(self.base_url + "/events/stream",
                                  stream=True, timeout=3600) as r:
                    for line in r.iter_lines():
                        if line and line.startswith(b"data: "):
                            try:
                                self.events.put_nowait(
                                    json.loads(line[6:]))
                            except (ValueError, queue.Full):
                                pass
            except Exception:
                time.sleep(2.0)

    def drain(self) -> list[dict]:
        while True:
            try:
                self.items.append(self.events.get_nowait())
            except queue.Empty:
                break
        self.items = self.items[-200:]
        return self.items


class TUI:
    def __init__(self, base_url: str = "http://localhost:9091",
                 token: Optional[str] = None):
        self.client = KektorDBClient(base_url, token)
        self.tail = EventTail(base_url)
        self.tab = 0
        self.search_input = ""
        self.search_results: list[dict] = []
        self.search_index = ""
        self.status = "connecting…"
        self.stats: dict = {}

    # ------------------------------------------------------------ data

    def refresh(self) -> None:
        try:
            self.stats = self.client.stats()
            self.status = "connected"
        except Exception as e:
            self.status = f"error: {e}"

    def run_search(self) -> None:
        try:
            indexes = self.client.list_indexes()
            if not indexes:
                self.search_results = []
                return
            name = self.search_index or indexes[0]["name"]
            from ..services.embeddings import HashingEmbedder
            qv = HashingEmbedder().embed(self.search_input).tolist()
            out = self.client.vsearch(name, qv, k=10,
                                      text_query=self.search_input,
                                      hydrate=True)
            self.search_results = out["results"]
        except KektorDBError as e:
            self.search_results = [{"id": f"error: {e}", "score": 0}]

    # ---------------------------------------------------------- render

    def draw(self, scr) -> None:
        scr.erase()
        h, w = scr.getmaxyx()
        header = "  ".join(
            f"[{i + 1}:{name}]" if i == self.tab else f" {i + 1}:{name} "
            for i, name in enumerate(TABS))
        scr.addnstr(0, 0, f"KektorDB-TPU  {header}", w - 1,
                    curses.A_REVERSE)
        scr.addnstr(h - 1, 0,
                    f" {self.status} | r:refresh /:search q:quit", w - 1,
                    curses.A_DIM)
        body = scr.derwin(h - 2, w, 1, 0)
        [self._dashboard, self._graph, self._search, self._timeline,
         self._settings][self.tab](body)
        scr.refresh()

    def _dashboard(self, win) -> None:
        h, w = win.getmaxyx()
        rows = [("index", "vectors", "deleted", "metric", "precision")]
        for name, info in (self.stats.get("indexes") or {}).items():
            rows.append((name, str(info["size"]), str(info["deleted"]),
                         info["metric"], info["precision"]))
        for y, row in enumerate(rows[: h - 3]):
            attr = curses.A_BOLD if y == 0 else 0
            win.addnstr(y + 1, 2, "  ".join(s.ljust(14) for s in row),
                        w - 3, attr)
        y = len(rows) + 2
        if y < h - 1:
            win.addnstr(y, 2,
                        f"kv keys: {self.stats.get('kv_keys', 0)}   "
                        f"graph nodes: {self.stats.get('graph_nodes', 0)}   "
                        f"dirty ops: {self.stats.get('dirty_ops', 0)}",
                        w - 3)

    def _graph(self, win) -> None:
        h, w = win.getmaxyx()
        win.addnstr(1, 2, "Graph explorer — top relations", w - 3,
                    curses.A_BOLD)
        try:
            indexes = self.client.list_indexes()
            y = 3
            for idx in indexes[:5]:
                out = self.client.search_nodes(idx["name"], limit=5)
                win.addnstr(y, 2, f"{idx['name']}: "
                            f"{out.get('total', 0)} nodes", w - 3)
                y += 1
                for node in out.get("nodes", [])[:3]:
                    win.addnstr(y, 4, f"- {node['id']}", w - 5)
                    y += 1
                if y >= h - 2:
                    break
        except Exception as e:
            win.addnstr(3, 2, f"error: {e}", w - 3)

    def _search(self, win) -> None:
        h, w = win.getmaxyx()
        win.addnstr(1, 2, f"query> {self.search_input}", w - 3,
                    curses.A_BOLD)
        for y, hit in enumerate(self.search_results[: h - 5]):
            meta = hit.get("metadata") or {}
            line = f"{hit['id']}  score={hit.get('score', 0):.3f}  " \
                   f"{str(meta.get('content', ''))[:60]}"
            win.addnstr(y + 3, 2, line, w - 3)

    def _timeline(self, win) -> None:
        h, w = win.getmaxyx()
        win.addnstr(1, 2, "Live events (/events/stream)", w - 3,
                    curses.A_BOLD)
        items = self.tail.drain()
        for y, ev in enumerate(reversed(items[-(h - 4):])):
            ts = time.strftime("%H:%M:%S", time.localtime(ev.get("ts", 0)))
            win.addnstr(y + 3, 2,
                        f"{ts}  {ev.get('type', ''):20} "
                        f"{ev.get('index', '')}/{ev.get('id', '')}", w - 3)

    def _settings(self, win) -> None:
        h, w = win.getmaxyx()
        win.addnstr(1, 2, "Connection", w - 3, curses.A_BOLD)
        win.addnstr(3, 2, f"base url: {self.client.base_url}", w - 3)
        win.addnstr(4, 2, f"status:   {self.status}", w - 3)

    # ------------------------------------------------------------- loop

    def loop(self, scr) -> None:
        curses.curs_set(0)
        scr.timeout(500)
        self.refresh()
        last_refresh = time.time()
        typing = False
        while True:
            if time.time() - last_refresh > 5:
                self.refresh()
                last_refresh = time.time()
            self.draw(scr)
            try:
                ch = scr.getch()
            except KeyboardInterrupt:
                return
            if ch == -1:
                continue
            if typing:
                if ch in (curses.KEY_ENTER, 10, 13):
                    typing = False
                    self.run_search()
                elif ch in (curses.KEY_BACKSPACE, 127, 8):
                    self.search_input = self.search_input[:-1]
                elif 32 <= ch < 127:
                    self.search_input += chr(ch)
                continue
            if ch in (ord("q"), 27):
                return
            if ch == ord("r"):
                self.refresh()
            elif ch == ord("/"):
                self.tab = 2
                self.search_input = ""
                typing = True
            elif ord("1") <= ch <= ord("5"):
                self.tab = ch - ord("1")


def main(argv=None) -> int:
    import sys
    args = argv if argv is not None else sys.argv[1:]
    base = args[0] if args else "http://localhost:9091"
    tui = TUI(base)
    curses.wrapper(tui.loop)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
