"""One-shot refactor (round 9): consolidate the 48 round-named catalog
shard files (catalog_r3*.py, catalog_r4.py, catalog_r6*.py,
catalog_r7.py) into domain modules, preserving all entry names, each
entry's source text verbatim, and intra-file segment order.

Method (two passes):

1. Split each shard into SEGMENTS (a run of top-level statements ending
   at a @register-decorated function), union-find segments that share
   module-level names (helper ``_sql_*`` functions / constants stay with
   every entry in the file that uses them), assign each group a domain
   by majority first-tag; record where every top-level symbol lands.
2. Emit one module per domain: merged header imports filtered to names
   the module body actually uses, cross-shard imports rewritten to the
   symbol's NEW home module (dropped when it is the same module), then
   the groups in (shard order, segment order).

Aborts loudly on any top-level name collision whose code differs (a
silent collision would rebind a helper under another entry's feet at
call time) and on any circular cross-module import.

Run from the repo root:  python tools/consolidate_catalog.py [--write]
Without --write it only prints the plan + collision report.
"""

from __future__ import annotations

import ast
import collections
import glob
import json
import os
import re
import sys

PKG = "markt_database_analyzer_spark"

TAG2DOMAIN = {
    "stats": "stats", "robust-stats": "stats", "survival": "stats",
    "regression": "stats", "histogram": "stats", "pca": "stats",
    "ml": "stats", "classify": "stats", "sketch": "stats", "agg": "stats",
    "aggregate": "stats", "aggregation": "stats", "changepoint": "stats",
    "timeseries": "timeseries", "markov": "timeseries", "window": "timeseries",
    "finance": "finance", "rfm": "finance",
    "text": "text", "search": "text", "retrieval": "text", "fuzzy": "text",
    "eval": "eval", "recommend": "eval", "attribution": "eval",
    "graph": "graph", "cluster": "graph", "paths": "graph",
    "events": "events", "growth": "events", "funnel": "events",
    "cohort": "events",
    "sampling": "sampling", "packing": "sampling", "layout": "sampling",
    "dedup": "datapipe", "similarity": "datapipe", "embeddings": "datapipe",
    "multimodal": "datapipe", "streaming": "datapipe", "cdc": "datapipe",
    "incremental": "datapipe", "pipeline": "datapipe",
    "entity-resolution": "datapipe",
    "privacy": "privacy", "dq": "privacy", "data-quality": "privacy",
    "profiling": "privacy",
    "sql": "engine", "join": "engine", "star-join": "engine",
    "lateral": "engine", "recursive-cte": "engine", "variant": "engine",
    "pivot": "engine", "interval": "engine", "intervals": "engine",
    "skyline": "engine", "bloom": "engine", "scd": "engine",
    "rollup": "engine", "source": "engine", "udf": "engine",
    "functions": "engine", "association-rules": "engine",
    "pareto": "engine", "asof-join": "engine",
}

DOMAIN_DOC = {
    "stats": "Statistical tests, estimators, sketches, and ML-adjacent analytics.",
    "timeseries": "Time-series operators: trends, seasonality, smoothing, symbolic forms.",
    "finance": "Financial analytics: returns, risk, indicators, RFM value segmentation.",
    "text": "Text analysis and retrieval/search operators beyond datapipe/text.py.",
    "eval": "Ranking / model-evaluation operators: calibration, lift, agreement.",
    "graph": "Graph analytics as bounded-round joins (degrees, communities, walks).",
    "events": "Behavioral event analytics: funnels, cohorts, growth accounting.",
    "sampling": "Deterministic sampling, packing, and layout operators.",
    "datapipe": "Training-data pipeline entries: dedup, similarity, multimodal, CDC.",
    "privacy": "Privacy audits and data-quality gates.",
    "engine": "Relational engine surface: join shapes, SQL parity forms, sources, UDFs.",
}

HEADER = '''"""{doc}

Consolidated in round 9 from the round-named catalog shards (the
original per-round files are in git history; entry source text is
unchanged). Every entry registers in REGISTRY with a DuckDB oracle
unless documented otherwise; reference parity citations live in the
entry docstrings.
"""

from __future__ import annotations

'''


def shard_files() -> list[str]:
    out = sorted(glob.glob(f"{PKG}/catalog_r3*.py")) + [f"{PKG}/catalog_r4.py"]
    out += sorted(glob.glob(f"{PKG}/catalog_r6*.py")) + [f"{PKG}/catalog_r7.py"]
    return out


class Segment:
    def __init__(self, nodes, entries, tags, lines):
        self.nodes = nodes
        self.entries = entries
        self.tags = tags
        self.defined: set[str] = set()
        self.used: set[str] = set()
        for n in nodes:
            for t in ast.walk(n):
                if isinstance(t, ast.Name):
                    self.used.add(t.id)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.defined.add(n.name)
            elif isinstance(n, ast.Assign):
                for tgt in n.targets:
                    if isinstance(tgt, ast.Name):
                        self.defined.add(tgt.id)
                    elif isinstance(tgt, (ast.Tuple, ast.List)):
                        for el in tgt.elts:
                            if isinstance(el, ast.Name):
                                self.defined.add(el.id)
            elif isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name):
                self.defined.add(n.target.id)
        self.text = "".join(node_text(lines, n) for n in nodes)


def is_register_def(node):
    names, tags = [], []
    if isinstance(node, ast.FunctionDef):
        for dec in node.decorator_list:
            if isinstance(dec, ast.Call) and getattr(dec.func, "id", "") == "register":
                if dec.args and isinstance(dec.args[0], ast.Constant):
                    names.append(dec.args[0].value)
                tag = None
                for kw in dec.keywords:
                    if kw.arg == "tags" and isinstance(kw.value, ast.Tuple) and kw.value.elts:
                        tag = kw.value.elts[0].value
                tags.append(tag or "stats")
    return names, tags


def node_text(lines, node) -> str:
    start = node.lineno - 1
    if getattr(node, "decorator_list", None):
        start = node.decorator_list[0].lineno - 1
    while start > 0 and lines[start - 1].lstrip().startswith("#"):
        start -= 1
    return "".join(lines[start : node.end_lineno])


def canon(t: str) -> str:
    code = [ln for ln in t.splitlines() if not ln.lstrip().startswith("#")]
    return " ".join("\n".join(code).split())


def parse_shard(path: str):
    src = open(path).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    body = list(tree.body)
    i = 0
    if body and isinstance(body[0], ast.Expr) and isinstance(body[0].value, ast.Constant) and isinstance(body[0].value.value, str):
        i = 1
    header_imports = []
    while i < len(body) and isinstance(body[i], (ast.Import, ast.ImportFrom)):
        header_imports.append(body[i])
        i += 1
    segments, pending = [], []
    for node in body[i:]:
        names, tags = is_register_def(node)
        if names:
            segments.append(Segment(pending + [node], names, tags, lines))
            pending = []
        else:
            pending.append(node)
    if pending:
        if not segments:
            raise SystemExit(f"{path}: no registered entries?")
        seg = segments[-1]
        seg.nodes.extend(pending)
        seg.text += "".join(node_text(lines, n) for n in pending)
        for n in pending:
            for t in ast.walk(n):
                if isinstance(t, ast.Name):
                    seg.used.add(t.id)
    return lines, header_imports, segments


def main() -> None:
    write = "--write" in sys.argv
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

    # ---------------- pass 1: parse, group, place ----------------
    shards = {}
    for path in shard_files():
        shards[path] = parse_shard(path)

    groups_by_module: dict[str, list[tuple[str, list[Segment]]]] = collections.defaultdict(list)
    symbol2mod: dict[str, str] = {}
    symbol_text: dict[str, str] = {}
    entry2mod: dict[str, str] = {}
    collisions = []

    for path, (lines, header_imports, segments) in shards.items():
        parent = list(range(len(segments)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        for a, sa in enumerate(segments):
            for b in range(a + 1, len(segments)):
                sb = segments[b]
                if sa.defined & sb.used or sb.defined & sa.used:
                    union(a, b)
        grouped = collections.defaultdict(list)
        for idx in range(len(segments)):
            grouped[find(idx)].append(idx)
        for root in sorted(grouped):
            segs = [segments[i] for i in grouped[root]]
            tags = [t for s in segs for t in s.tags]
            domain = collections.Counter(
                TAG2DOMAIN.get(t, "engine") for t in tags
            ).most_common(1)[0][0]
            groups_by_module[domain].append((path, segs))
            for s in segs:
                for e in s.entries:
                    entry2mod[e] = domain
                for name in s.defined:
                    mytext = None
                    for n in s.nodes:
                        tgt_names = set()
                        if isinstance(n, ast.Assign):
                            for t in n.targets:
                                if isinstance(t, ast.Name):
                                    tgt_names.add(t.id)
                                elif isinstance(t, (ast.Tuple, ast.List)):
                                    tgt_names |= {e.id for e in t.elts if isinstance(e, ast.Name)}
                        if getattr(n, "name", None) == name or name in tgt_names:
                            mytext = node_text(shards[path][0], n)
                    if name in symbol2mod and mytext is not None:
                        if symbol2mod[name] == domain and canon(symbol_text.get(name, "")) != canon(mytext):
                            collisions.append((domain, name, path))
                    symbol2mod[name] = domain if name not in symbol2mod else symbol2mod[name]
                    if mytext is not None and name not in symbol_text:
                        symbol_text[name] = mytext

    # ---------------- pass 2: emit ----------------
    out_files: dict[str, str] = {}
    cross_deps: dict[str, set[str]] = collections.defaultdict(set)
    for domain, groups in groups_by_module.items():
        body = "\n\n\n".join(
            "\n\n".join(s.text.rstrip("\n") for s in segs) for _, segs in groups
        )
        # collect header imports from contributing shards, in order
        contributing = []
        for path, _ in groups:
            if path not in contributing:
                contributing.append(path)
        import_lines: list[str] = []
        seen = set()
        cross_needed: dict[str, set[str]] = collections.defaultdict(set)
        alias_src: dict[str, str] = {}
        for path in contributing:
            lines, header_imports, _ = shards[path]
            for hn in header_imports:
                text = node_text(lines, hn)
                key = " ".join(text.split())
                if key.startswith("from __future__"):
                    continue
                mod = getattr(hn, "module", None) or ""
                if isinstance(hn, ast.ImportFrom) and re.fullmatch(r"catalog_r\w+", mod):
                    # cross-shard import: re-home each name individually
                    for alias in hn.names:
                        name = alias.name
                        tgt = symbol2mod.get(name)
                        if tgt is None:
                            raise SystemExit(f"{path}: cross-shard name {name} unplaced")
                        if tgt != domain and re.search(rf"\b{re.escape(name)}\b", body):
                            cross_needed[tgt].add(name)
                    continue
                # usage filter: keep only if some bound alias appears in body
                bound = [a.asname or a.name.split(".")[0] for a in hn.names]
                if not any(re.search(rf"\b{re.escape(b)}\b", body) for b in bound):
                    continue
                for a, b in zip(hn.names, bound):
                    srcmod = (mod or a.name).replace("functions.aggregates", "functions")
                    prev = alias_src.get(b)
                    if prev is not None and prev != f"{srcmod}.{a.name}":
                        collisions.append((domain, f"import alias {b}", path))
                    alias_src[b] = f"{srcmod}.{a.name}"
                if key not in seen:
                    seen.add(key)
                    import_lines.append(text)
        for tgt, names in sorted(cross_needed.items()):
            import_lines.append(
                f"from .catalog_{tgt} import {', '.join(sorted(names))}\n"
            )
            cross_deps[domain].add(tgt)
        out_files[domain] = (
            HEADER.format(doc=DOMAIN_DOC[domain]) + "".join(import_lines) + "\n\n" + body + "\n"
        )

    # circularity check on cross-module deps
    def reaches(a, b, seen=None):
        seen = seen or set()
        if a == b:
            return True
        for nxt in cross_deps.get(a, ()):
            if nxt not in seen:
                seen.add(nxt)
                if reaches(nxt, b, seen):
                    return True
        return False

    cycles = [
        (a, b)
        for a in cross_deps
        for b in cross_deps[a]
        if reaches(b, a)
    ]

    print("plan:")
    for d in sorted(out_files):
        n_entries = sum(1 for e, m in entry2mod.items() if m == d)
        print(f"  catalog_{d}.py: {n_entries:3d} entries, {len(out_files[d])//1024:4d} KiB")
    print(f"total entries mapped: {len(entry2mod)}")
    if cross_deps:
        print("cross-module deps:", {k: sorted(v) for k, v in cross_deps.items()})
    if collisions:
        print("\nCOLLISIONS:")
        for c in collisions:
            print("  ", c)
    if cycles:
        print("\nCYCLES:", cycles)
    if collisions or cycles:
        if write:
            raise SystemExit("refusing to write with collisions/cycles")
    if not write:
        return

    for d, text in out_files.items():
        with open(f"{PKG}/catalog_{d}.py", "w") as f:
            f.write(text)
    cat = open(f"{PKG}/catalog.py").read()
    lines = cat.splitlines(keepends=True)
    kept = [ln for ln in lines if not ln.startswith("from . import catalog_r")]
    out_lines = []
    for ln in kept:
        out_lines.append(ln)
        if ln.startswith("from . import catalog_tpch"):
            for d in sorted(out_files):
                out_lines.append(f"from . import catalog_{d}  # noqa: E402,F401\n")
    with open(f"{PKG}/catalog.py", "w") as f:
        f.writelines(out_lines)
    for path in shard_files():
        os.remove(path)
    with open("tools/catalog_consolidation_map.json", "w") as f:
        json.dump({"entries": entry2mod, "symbols": symbol2mod}, f, indent=1, sort_keys=True)
    print("written.")


if __name__ == "__main__":
    main()
