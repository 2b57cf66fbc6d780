# KektorDB-TPU developer targets

.PHONY: test test-fast bench native serve mcp lint clean sync-skills

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_distance.py tests/test_text_persist.py \
	    tests/test_services.py tests/test_contracts.py -q

bench:
	JAX_COMPILATION_CACHE_DIR=$(HOME)/.cache/jax_comp_cache \
	JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1 \
	python -u bench.py

native:
	g++ -O3 -march=native -fopenmp -shared -fPIC \
	    -o kektordb_tpu/native/kektor_native.so \
	    kektordb_tpu/native/kektor_native.cpp

serve:
	python -m kektordb_tpu serve

mcp:
	python -m kektordb_tpu mcp

lint:
	python -m compileall -q kektordb_tpu

# skills/kektordb/SKILL.md is a byte-for-byte mirror of the MCP server's
# memory_instructions resource so users can drop it into agent systems
# that consume skill files. After editing the source, re-run this;
# tests/test_services.py::test_skill_mirror_in_sync enforces parity
# (reference: Makefile:188-194 sync-skills + TestMemoryInstructionsInSync).
sync-skills:
	mkdir -p skills/kektordb
	cp kektordb_tpu/server/memory_instructions.md skills/kektordb/SKILL.md

clean:
	rm -rf kektordb_tpu/native/kektor_native.so .pytest_cache \
	    $(shell find . -name __pycache__ -type d)
