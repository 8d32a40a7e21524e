"""Pytest plugin: rebind each differential module's SEED for a fresh-seed sweep.

The seeded differential suites draw their corpora from a module-level ``SEED``
constant read at call time. Running the same suites under a different base
re-draws every corpus, turning each suite into a fresh randomized trial of the
same emulator-vs-engine contract (this is how several real product bugs were
found in earlier rounds). Usage:

    FRESH_SEED_BASE=314159265 python -m pytest tests/test_differential*.py \
        -q -p tools.fresh_seed_plugin

Each module gets ``base + crc32(module_name)`` so modules stay decorrelated.
"""

from __future__ import annotations

import os
import zlib


def pytest_collection_finish(session):
    base = int(os.environ.get("FRESH_SEED_BASE", "0"))
    if not base:
        return
    seen = set()
    for item in session.items:
        mod = getattr(item, "module", None)
        if mod is None or mod in seen:
            continue
        seen.add(mod)
        name = mod.__name__
        if "differential" in name and hasattr(mod, "SEED"):
            mod.SEED = base + zlib.crc32(name.encode())
            print(f"fresh-seed: {name}.SEED = {mod.SEED}")
