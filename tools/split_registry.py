"""One-shot mechanical splitter for plans/benchmark_queries.py (r12 verdict
item 5: per-family modules before the file passes 5k lines).

Attribution rules:
- ``def qNN_*`` and ``ORACLE_QNN`` blocks go to the family module mapped
  from the query number below;
- ``_xxx_oracle`` helper defs go to the family of the first query whose
  dict entry calls them (scanned from the QUERIES dict source);
- everything else (imports, QuerySpec, shared constants/helpers) goes to
  ``queries/_shared.py`` in original order;
- the QUERIES dict stays in benchmark_queries.py, which imports every
  name the dict references from the family modules.

Family modules import _shared names explicitly (computed by identifier
scan — ``import *`` would skip the underscore-prefixed helpers).  The
script prints per-module line counts and any unresolved identifiers; it
writes nothing outside --out.
"""

from __future__ import annotations

import ast
import re
from collections import defaultdict

SRC = "foresttime_builder_spark/plans/benchmark_queries.py"
PKG = "foresttime_builder_spark/plans/queries"

FAMILY_OF = {}
_map = {
    "relational": [1, 2, 3, 4, 5, 6, 18, 19, 20, 21, 22, 41, 47, 48, 62,
                   67, 73, 103, 104, 105, 109, 113],
    "timeseries": [7, 8, 9, 10, 11],
    "fia": [25, 26, 27, 28, 38, 39, 51, 52],
    "streaming": [29, 30, 31, 53, 68, 69, 96, 108],
    "text": [13, 14, 15, 32, 33, 34, 58, 59, 60, 61, 63, 64, 72, 80, 81,
             83, 85, 91],
    "relevance": [82, 86, 88, 89, 94],
    "dedup": [12, 16, 23, 24, 50, 54, 71, 76, 77, 87, 90, 111, 116, 119, 120],
    "ann": [17, 37, 40, 42, 95, 101],
    "sampling": [56, 57, 65, 74, 78, 84, 99, 102, 112, 114],
    "profile": [46, 98, 107, 115, 117, 118],
    "infra": [43, 44, 45, 49, 66, 70, 75, 79, 92, 93, 97, 100, 106, 110],
    "multimodal": [35, 36, 55],
}
for fam, nums in _map.items():
    for n in nums:
        FAMILY_OF[n] = fam

src = open(SRC).read()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)


def block_names(node):
    """ALL names a top-level block defines (tuple unpacking included)."""
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return [node.name]
    if isinstance(node, ast.Assign):
        names = []
        for t in node.targets:
            for n in ast.walk(t):
                if isinstance(n, ast.Name):
                    names.append(n.id)
        return names
    if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        return [node.target.id]
    return []


def block_name(node):
    ns = block_names(node)
    return ns[0] if ns else None


blocks = []
for node in tree.body:
    lo = node.lineno
    if getattr(node, "decorator_list", None):
        lo = min(lo, *(d.lineno for d in node.decorator_list))
    blocks.append((block_name(node), lo, node.end_lineno, node))

extra_names = {}  # secondary tuple-assignment names -> primary block name
for node in tree.body:
    ns = block_names(node)
    for n in ns[1:]:
        extra_names[n] = ns[0]


def text_of(b):
    return "".join(lines[b[1] - 1 : b[2]])


# locate the QUERIES dict source to map _xxx_oracle helpers to families
queries_block = next(b for b in blocks if b[0] == "QUERIES")
qdict_text = text_of(queries_block)
entry_re = re.compile(r'"q(\d+)_\w+":\s*QuerySpec\(([^)]*)\)', re.S)
helper_family = {}
for m in entry_re.finditer(qdict_text):
    num = int(m.group(1))
    for ident in re.findall(r"[A-Za-z_]\w*", m.group(2)):
        if ident.startswith("_") and ident.endswith("_oracle"):
            helper_family.setdefault(ident, FAMILY_OF[num])

out: dict[str, list] = defaultdict(list)
header_end = 0
for b in blocks:
    name, lo, hi, node = b
    if name == "QUERIES":
        continue
    m = re.match(r"^(?:q|ORACLE_Q)0*(\d+)", name or "")
    if m:
        out[FAMILY_OF[int(m.group(1))]].append(b)
    elif name in helper_family:
        out[helper_family[name]].append(b)
    else:
        out["_shared"].append(b)

# names defined per module (tuple-assignment secondaries included)
defined = {}
for mod, bs in out.items():
    names = set()
    for b in bs:
        names.update(block_names(b[3]))
    defined[mod] = names
all_defined = {}
for mod, names in defined.items():
    for n in names:
        all_defined[n] = mod

# every family module gets the ORIGINAL file's import header verbatim —
# function bodies reference these names at call time (the q50 gate caught
# a minimal-header variant missing derive_candidate_budget); unused
# imports in some families are harmless
_orig_import_blocks = [
    b for b in [(block_name(n), n.lineno, n.end_lineno, n) for n in tree.body]
    if isinstance(b[3], (ast.Import, ast.ImportFrom))
]
ORIG_IMPORTS = "".join(
    "".join(lines[b[1] - 1 : b[2]]) for b in _orig_import_blocks
)

HEADER = (
    '"""{title} — split from plans/benchmark_queries.py (r13, mechanical\n'
    'move; see that module\'s docstring).  QUERIES contract unchanged."""\n\n'
    + ORIG_IMPORTS
)

import os

os.makedirs(PKG, exist_ok=True)
report = {}
for mod, bs in sorted(out.items()):
    body = "\n".join(text_of(b).rstrip("\n") + "\n" for b in bs)
    if mod == "_shared":
        # _shared keeps the ORIGINAL import header verbatim (first block
        # run of imports), so operator imports keep working
        text = body
    else:
        used = set(re.findall(r"[A-Za-z_]\w*", body))
        need = sorted(
            n for n in used
            if n in all_defined and all_defined[n] != mod and n not in defined[mod]
        )
        imports = []
        by_mod = defaultdict(list)
        for n in need:
            by_mod[all_defined[n]].append(n)
        for src_mod, ns in sorted(by_mod.items()):
            mpath = f"foresttime_builder_spark.plans.queries.{src_mod}"
            imports.append(
                f"from {mpath} import (  # noqa: F401\n    "
                + ",\n    ".join(ns)
                + ",\n)"
            )
        text = (
            HEADER.format(title=f"{mod} benchmark queries")
            + "\n"
            + "\n".join(imports)
            + ("\n\n\n" if imports else "\n\n")
            + body
        )
    path = f"{PKG}/{mod}.py"
    with open(path, "w") as f:
        f.write(text)
    report[mod] = text.count("\n")

with open(f"{PKG}/__init__.py", "w") as f:
    f.write('"""Per-family benchmark query modules (split in r13)."""\n')

# new benchmark_queries.py: docstring + imports + QUERIES dict
doc_end = blocks[0][2] if isinstance(blocks[0][3], ast.Expr) else 0
docstring = "".join(lines[:doc_end])
dict_idents = set(re.findall(r"[A-Za-z_]\w*", qdict_text))
need = sorted(n for n in dict_idents if n in all_defined)
by_mod = defaultdict(list)
for n in need:
    by_mod[all_defined[n]].append(n)
imps = []
for src_mod, ns in sorted(by_mod.items()):
    mpath = f"foresttime_builder_spark.plans.queries.{src_mod}"
    imps.append(
        f"from {mpath} import (  # noqa: F401\n    "
        + ",\n    ".join(sorted(ns))
        + ",\n)"
    )
new_main = (
    docstring
    + "\nfrom __future__ import annotations\n\n"
    + "\n".join(imps)
    + "\n\n\n"
    + qdict_text
)
with open(SRC + ".new", "w") as f:
    f.write(new_main)
report["benchmark_queries(new)"] = new_main.count("\n")

for mod, n in sorted(report.items(), key=lambda kv: -kv[1]):
    print(f"{mod:28s} {n:5d} lines")
