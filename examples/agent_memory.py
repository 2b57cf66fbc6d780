"""Agent memory via the MCP service (in-process, no stdio needed).

Shows the save/recall/entity/evolve/belief loop an agent would drive
through the MCP tools.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run from anywhere

from kektordb_tpu.engine import Engine, EngineConfig
from kektordb_tpu.server.mcp import MCPService

engine = Engine(EngineConfig(start_background=False)).open()
svc = MCPService(engine)

# save memories
m1 = svc.call("save_memory", {"content": "The user prefers short answers"})
svc.call("save_memory", {"content": "Project Atlas ships in March"})

# entities + relations
svc.call("create_entity", {"name": "Atlas", "entity_type": "project"})
svc.call("connect_entities", {"source": m1["id"], "relation": "mentions",
                              "target": "ent_atlas"})

# recall (hybrid, decay-aware, reinforces hits)
out = svc.call("recall_memory", {"query": "what does the user like"})
print("recall:", out["memories"][0]["content"])

# evolve a memory when a fact changes
ev = svc.call("evolve_memory", {"old_id": m1["id"],
                                "new_content":
                                    "The user prefers bullet points"})
print("evolved into:", ev["new_id"])
print("chain:", svc.call("get_memory_evolution", {"id": ev["new_id"]}))

# epistemic status
print("belief:", svc.call("assess_belief", {"id": ev["new_id"]})["state"])
engine.close()
