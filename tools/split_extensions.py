"""One-shot splitter for the extensions.py monolith (VERDICT r6 #3).

Parses ksql_query_tutorial_spark/extensions.py into top-level blocks,
assigns each block to a per-family module by query-name prefix (helpers
and constants go where their users live; multi-family names go to
_shared), verifies the resulting module graph is acyclic and that every
registry read happens after its write in the new execution order, and
emits the ksql_query_tutorial_spark/extensions/ package.

Pure move: block text is copied verbatim in original relative order;
the only synthesized code is imports, the registry bootstrap, and the
conversion of the two seed dict literals into per-family registration
statements at their original positions.

Run with no args for a dry-run partition report; --write to emit files
(the caller deletes the old extensions.py first).
"""

from __future__ import annotations

import ast
import sys
from collections import defaultdict

# As-run r7 note: the monolith was moved aside before emission, so this
# points at the backup location the split actually read from. The tool is
# kept as the historical record of the split; the monolith no longer
# exists in-tree (git history has it at commit 3511646 and earlier).
SRC = "/tmp/extensions_monolith_backup.py"
PKG = "ksql_query_tutorial_spark/extensions"

FAMILY_OF_PREFIX = {
    "text": "text_q",
    "dedup": "dedup_q", "span": "dedup_q",
    "similarity": "similarity_q", "ann": "similarity_q",
    "embedding": "similarity_q", "hybrid": "similarity_q",
    "corpus": "corpus_q", "pack": "corpus_q", "mix": "corpus_q",
    "sample": "corpus_q", "decontaminate": "corpus_q",
    "events": "events_q",
    "graph": "graph_q",
    "privacy": "privacy_q",
    "mm": "mm_q",
    "asof": "joins_q", "range": "joins_q", "rollup": "joins_q",
    "layout": "joins_q",
    "orders": "retail_q", "supplier": "retail_q", "lineitem": "retail_q",
    "nation": "retail_q", "part": "retail_q", "customer": "retail_q",
    "profile": "retail_q", "audit": "retail_q",
}

MODULE_ORDER = [
    "text_q", "dedup_q", "similarity_q", "joins_q", "mm_q", "corpus_q",
    "events_q", "graph_q", "privacy_q", "retail_q",
]

# names with external (test) import surface that must stay in _shared
FORCE_SHARED = {"_TOKS", "_SHINGLES"}


def family_of_key(key: str) -> str:
    return FAMILY_OF_PREFIX[key.split("_")[0]]


class Block:
    def __init__(self, idx, node, start, end, text):
        self.idx = idx
        self.node = node
        self.start = start
        self.end = end
        self.text = text
        self.defines: set[str] = set()
        self.writes_keys: set[tuple] = set()
        self.reads_keys: set[tuple] = set()
        self.refs: set[str] = set()
        self.family: str | None = None


def analyze(src_text: str):
    tree = ast.parse(src_text)
    lines = src_text.splitlines()
    blocks: list[Block] = []
    prev_end = 0
    for i, node in enumerate(tree.body):
        start = min(
            [node.lineno]
            + [d.lineno for d in getattr(node, "decorator_list", [])]
        )
        s = start - 1
        while s - 1 >= prev_end and (
            lines[s - 1].startswith("#") or not lines[s - 1].strip()
        ):
            s -= 1
        while s < start - 1 and not lines[s].strip():
            s += 1
        end = node.end_lineno
        text = "\n".join(lines[s:end])
        b = Block(i, node, s + 1, end, text)
        prev_end = end
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            b.defines.add(node.name)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (node.targets if isinstance(node, ast.Assign)
                       else [node.target])
            for t in targets:
                if isinstance(t, ast.Name):
                    b.defines.add(t.id)
                elif (isinstance(t, ast.Subscript)
                      and isinstance(t.value, ast.Name)
                      and t.value.id in ("EXTENSION_QUERIES",
                                         "EXTENSION_ORACLES")
                      and isinstance(t.slice, ast.Constant)):
                    b.writes_keys.add((t.value.id, t.slice.value))
        for n in ast.walk(node):
            if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load):
                b.refs.add(n.id)
            if (isinstance(n, ast.Subscript) and isinstance(n.ctx, ast.Load)
                    and isinstance(n.value, ast.Name)
                    and n.value.id in ("EXTENSION_QUERIES",
                                       "EXTENSION_ORACLES")
                    and isinstance(n.slice, ast.Constant)):
                b.reads_keys.add((n.value.id, n.slice.value))
        blocks.append(b)
    return tree, blocks


def expr_text(lines, v) -> str:
    if v.lineno == v.end_lineno:
        return lines[v.lineno - 1][v.col_offset:v.end_col_offset]
    first = lines[v.lineno - 1][v.col_offset:]
    middle = lines[v.lineno:v.end_lineno - 1]
    last = lines[v.end_lineno - 1][:v.end_col_offset]
    return "\n".join([first] + middle + [last])


def main():
    write = "--write" in sys.argv
    src_text = open(SRC).read()
    lines = src_text.splitlines()
    tree, blocks = analyze(src_text)

    defined_by: dict[str, Block] = {}
    for b in blocks:
        for d in b.defines:
            defined_by[d] = b

    # ---- header / seed classification
    header_last = -1
    for b in blocks:
        if isinstance(b.node, (ast.Import, ast.ImportFrom)) or (
            isinstance(b.node, ast.Expr)
            and isinstance(b.node.value, ast.Constant)
        ):
            header_last = b.idx
        else:
            break
    seeds: list[Block] = []
    for b in blocks:
        if b.idx <= header_last:
            b.family = "_header"
            continue
        node = b.node
        tname = None
        if isinstance(node, ast.Assign) and len(node.targets) == 1 and \
                isinstance(node.targets[0], ast.Name):
            tname = node.targets[0].id
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target,
                                                            ast.Name):
            tname = node.target.id
        if tname in ("EXTENSION_QUERIES", "EXTENSION_ORACLES") and \
                isinstance(node.value, ast.Dict):
            b.family = "_seed"
            seeds.append(b)

    # ---- explode seeds into per-entry pseudo-blocks at original lines
    pseudo: list[Block] = []
    for b in seeds:
        node = b.node
        t = node.targets[0] if isinstance(node, ast.Assign) else node.target
        reg = t.id
        d = b.node.value
        prev_end = b.node.value.lineno  # line of the opening brace
        for kk, vv in zip(d.keys, d.values):
            fam = family_of_key(kk.value)
            vtxt = expr_text(lines, vv)
            # keep comment lines sitting between the previous entry and
            # this key (they annotate this entry)
            comments = [
                ln for ln in lines[prev_end:kk.lineno - 1]
                if ln.strip().startswith("#")
            ]
            prev_end = vv.end_lineno
            prefix = "".join(c.strip() + "\n" for c in comments)
            pb = Block(10_000 + len(pseudo), None, kk.lineno, vv.end_lineno,
                       f'{prefix}{reg}["{kk.value}"] = {vtxt}')
            pb.family = fam
            pb.writes_keys = {(reg, kk.value)}
            if isinstance(vv, ast.Name):
                pb.refs = {vv.id}
            else:
                for n in ast.walk(vv):
                    if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load):
                        pb.refs.add(n.id)
            pseudo.append(pb)

    # seed-registered function names pin their def's family
    fn_key_family: dict[str, str] = {}
    for pb in pseudo:
        (reg, key), = pb.writes_keys
        if reg == "EXTENSION_QUERIES" and len(pb.refs) == 1:
            fn_key_family[next(iter(pb.refs))] = family_of_key(key)
    key_writer: dict[tuple, Block] = {}
    for b in blocks + pseudo:
        for k in b.writes_keys:
            key_writer[k] = b
    for b in blocks:
        if b.family:
            continue
        fams = {family_of_key(k[1]) for k in b.writes_keys}
        if len(fams) == 1:
            b.family = fams.pop()
        elif len(fams) > 1:
            print(f"MULTI-FAMILY WRITE block {b.start}-{b.end}: {fams}")
            return 1
    for b in blocks:
        if b.family:
            continue
        for dn in b.defines:
            if dn in fn_key_family:
                b.family = fn_key_family[dn]
                break
    for b in blocks:
        if not b.family and b.defines & FORCE_SHARED:
            b.family = "_shared"

    # ---- usage-propagation for helpers/constants
    changed = True
    while changed:
        changed = False
        for b in blocks:
            if b.family:
                continue
            users = set()
            for other in blocks + pseudo:
                if other is b or not other.family or \
                        other.family.startswith("_"):
                    continue
                if b.defines & other.refs or \
                        b.writes_keys & other.reads_keys:
                    users.add(other.family)
            if len(users) == 1:
                b.family = users.pop()
                changed = True
            elif len(users) > 1:
                b.family = "_shared"
                changed = True
    for b in blocks:
        if not b.family:
            b.family = "_shared"

    # ---- promote cross-family name deps to _shared, transitively
    changed = True
    while changed:
        changed = False
        for b in blocks + pseudo:
            if b.family in ("_header", "_seed"):
                continue
            for r in b.refs:
                if r in ("EXTENSION_QUERIES", "EXTENSION_ORACLES"):
                    continue  # resolved via the _registry import
                db = defined_by.get(r)
                if db and db.family not in (b.family, "_shared", "_header",
                                            "_seed"):
                    db.family = "_shared"
                    changed = True

    # _shared must not read registries (no ordering guarantee)
    for b in blocks:
        if b.family == "_shared" and (b.reads_keys or b.writes_keys):
            print(f"SHARED BLOCK TOUCHES REGISTRY: lines {b.start}-{b.end}")
            return 1

    # ---- execution-order validation
    fams = defaultdict(list)
    for b in blocks + pseudo:
        if b.family in ("_header", "_seed"):
            continue
        fams[b.family].append(b)
    for fam in fams:
        fams[fam].sort(key=lambda b: b.start)

    exec_order = fams.get("_shared", [])[:]
    for fam in MODULE_ORDER:
        exec_order += fams.get(fam, [])
    written: set[tuple] = set()
    available: set[str] = set(defined_by)  # names resolve via imports at
    # module top (all defs importable from _shared), EXCEPT order within
    # a module: validate name order within the same module only.
    seen_names_by_mod: dict[str, set[str]] = defaultdict(set)
    ok = True
    for b in exec_order:
        for k in b.reads_keys:
            if k not in written:
                print(f"READ-BEFORE-WRITE {k} at lines {b.start}-{b.end} "
                      f"({b.family})")
                ok = False
        for r in b.refs:
            if r in ("EXTENSION_QUERIES", "EXTENSION_ORACLES"):
                continue  # resolved via the _registry import
            db = defined_by.get(r)
            if db is None or db.family in ("_header",):
                continue
            if db.family == b.family:
                if r not in seen_names_by_mod[b.family]:
                    print(f"NAME-BEFORE-DEF {r} at lines {b.start}-{b.end} "
                          f"({b.family})")
                    ok = False
            elif db.family != "_shared":
                print(f"CROSS-MODULE NAME {r}: {db.family} -> {b.family}")
                ok = False
            elif b.family == "_shared":
                pass  # within-shared order checked via same-family branch
        written |= b.writes_keys
        for d in b.defines:
            seen_names_by_mod[b.family].add(d)
    if not ok:
        return 1

    sizes = defaultdict(int)
    for fam, bs in fams.items():
        sizes[fam] = sum(b.end - b.start + 1 for b in bs)
    for fam in sorted(sizes):
        print(f"{fam:14s} {len(fams[fam]):4d} blocks {sizes[fam]:6d} lines")

    if not write:
        return 0
    emit(fams)
    return 0


HEADER = '''\
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ksql_query_tutorial_spark.operators import (
    asof,
    corpus,
    dedup,
    multimodal,
    rangejoin,
    rollup,
    similarity,
    text,
)
from ksql_query_tutorial_spark.tables import load

from ._registry import EXTENSION_ORACLES, EXTENSION_QUERIES
from ._shared import *  # noqa: F401,F403 — shared constants/SQL fragments
'''

MODULE_DOC = {
    "text_q": "Text-analysis extension queries (quality, lang-id, PII, "
              "entropy, readability, fingerprints, histograms).",
    "dedup_q": "Deduplication extension queries (exact, n-gram Jaccard, "
               "MinHash-LSH, SimHash, embedding, incremental, span, "
               "containment, Levenshtein, savings reports).",
    "similarity_q": "Similarity / ANN / embedding extension queries "
                    "(top-k, LSH/IVF/PQ, k-means, PCA, hybrid search, "
                    "recall evals).",
    "joins_q": "As-of join, range join, rollup, and storage-layout "
               "extension queries.",
    "mm_q": "Multimodal extension queries (frames, features, resize, "
            "audio windows) over Arrow mapInPandas with env-gated codecs.",
    "corpus_q": "Corpus-curation extension queries (chunk, tf-idf, "
                "split/shuffle, BPE, decontamination, sketches, "
                "Heaps/Zipf, packing, mixing).",
    "events_q": "Event-analytics extension queries (sessions, funnels, "
                "attribution, windows, anomaly/CUSUM, retention, "
                "streaming-analog state).",
    "graph_q": "Graph extension queries (triangles, clustering "
               "coefficient, k-core, pagerank, assortativity).",
    "privacy_q": "Privacy extension queries (k-anonymity, l-diversity, "
                 "t-closeness, DP counts, generalization ladder).",
    "retail_q": "Retail / decision-support extension queries over the "
                "TPC-H-shaped fixtures (orders, lineitem, supplier, "
                "part, nation, customer, audits, profiling).",
}

INIT_DOC = '''"""Extension query catalog: the LLM-training-data-pipeline
operators (dedup / similarity / text analysis / corpus curation /
multimodal / events / graph / privacy / retail analytics) as declared
queries over the driver fixtures, with DuckDB oracles where the
semantics are SQL-expressible (otherwise the driver's rows-only check
applies: IVF/PQ-ANN with learned centroids).

Split into per-family modules in r7 (VERDICT r6 #3) — importing them
here in dependency order populates the shared registries in
``_registry``; ``from ksql_query_tutorial_spark.extensions import X``
keeps working for every name the monolith exported.

Thresholds are calibrated to the fixtures: document near-dups are
planted with shingle-Jaccard >= 0.5 (noise pairs < 0.1), embedding
near-neighbors peak at cosine ~ 0.51 — so jaccard_threshold=0.5 and
cosine_threshold=0.4 select the planted structure.
"""
'''


def emit(fams):
    import os
    os.makedirs(PKG, exist_ok=True)

    shared_blocks = fams.pop("_shared", [])
    shared_names = sorted({n for b in shared_blocks for n in b.defines})
    with open(f"{PKG}/_shared.py", "w") as f:
        f.write('"""Constants, SQL fragments, and helpers shared by more '
                'than one\nextension-family module (split from the former '
                'extensions.py monolith —\npure move, VERDICT r6 #3). '
                '``__all__`` includes the underscore names so\nthe family '
                'modules and tests can star-import them."""\n\n')
        f.write("from __future__ import annotations\n\n")
        f.write("from pyspark.sql import DataFrame, SparkSession\n")
        f.write("from pyspark.sql import functions as F\n\n")
        f.write("from ksql_query_tutorial_spark.operators import (\n")
        f.write("    asof,\n    corpus,\n    dedup,\n    multimodal,\n")
        f.write("    rangejoin,\n    rollup,\n    similarity,\n    text,\n)\n")
        f.write("from ksql_query_tutorial_spark.tables import load\n\n")
        f.write("__all__ = [\n")
        for n in shared_names:
            f.write(f"    {n!r},\n")
        f.write("]\n")
        for b in shared_blocks:
            f.write("\n\n" + b.text + "\n")

    with open(f"{PKG}/_registry.py", "w") as f:
        f.write('"""The single shared query/oracle registries every '
                'family module\nregisters into; the import order in '
                '``__init__`` fixes registration order."""\n\n')
        f.write("from __future__ import annotations\n\n")
        f.write("from collections.abc import Callable\n\n")
        f.write("from pyspark.sql import DataFrame, SparkSession\n\n")
        f.write("EXTENSION_QUERIES: dict[")
        f.write("str, Callable[[SparkSession, str], DataFrame]] = {}\n")
        f.write("EXTENSION_ORACLES: dict[str, str] = {}\n")

    for fam in MODULE_ORDER:
        bs = fams.get(fam, [])
        with open(f"{PKG}/{fam}.py", "w") as f:
            f.write(f'"""{MODULE_DOC[fam]}\n\nSplit from the former '
                    f'extensions.py monolith (pure move; VERDICT r6 #3).\n'
                    f'"""\n\n')
            f.write(HEADER)
            for b in bs:
                f.write("\n\n" + b.text + "\n")

    with open(f"{PKG}/__init__.py", "w") as f:
        f.write(INIT_DOC)
        f.write("\nfrom ._registry import EXTENSION_ORACLES, "
                "EXTENSION_QUERIES  # noqa: F401\n")
        f.write("from ._shared import *  # noqa: F401,F403,E402\n")
        for fam in MODULE_ORDER:
            f.write(f"from .{fam} import *  # noqa: F401,F403,E402\n")
    print("emitted extensions/ package")


if __name__ == "__main__":
    raise SystemExit(main())
