"""Round-9 scale probe: the sharded pointer-manifest layer at the
module's own stated target (10^5-10^6 table files).

VERDICT r8 item 2 asked for proof that a pointer commit's cost is
bound by the TOUCHED-DIR file count and manifest bytes, not the table
file count — the failure mode of the round-8 inline manifest, whose
root JSON listed every live file (a one-dir commit rewrote a ~100 MB
object at 10^6 files).

This probe exercises the REAL commit layer (manifest_bootstrap,
_set_dir_files, _write_commit, read_commit, manifest_files,
vacuum-visible claim rotation) against fabricated table layouts —
empty `.parquet`-named files created with plain open(): the commit
layer never opens a data file, only lists names, so the layout is
exactly what it sees at 100 TB.  Spark is not involved (the data-append
cost is measured by the bench's real upsert entries; this isolates the
metadata protocol the way the round-8 zonemap probe isolated pruning).

For each decade (10^3 / 10^4 / 10^5 files over a fixed 100 dirs):
  - bootstrap wall time (one-time adoption, expected O(files))
  - ONE-DIR commit: wall time + bytes written (root claim + the one
    shard) under the SHARDED protocol vs the same commit under the
    INLINE protocol (MANIFEST_INLINE_MAX=inf), whose root bytes grow
    with the table
  - head resolution (read_commit) and a PRUNED file-list build
    (manifest_files over 1 dir) vs the FULL list build

Usage: python scripts/scale_probe_r9.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dask_expr_spark import fsops                      # noqa: E402
from dask_expr_spark.functions import maintenance as M  # noqa: E402

N_DIRS = 100
TOUCHED_FILES = 1_000          # new committed file count in the dir

# multi-level variant: the same 100 leaves as 20 date dirs x 5 source
# dirs, probing that nested layouts keep the same touched-leaf-bound
# commit contract (round-9 multicol support)
MULTI_SPEC = [("d", 20), ("src", 5)]


def _leaf_dirs(multi: bool) -> list[str]:
    if not multi:
        return [f"part={i:04d}" for i in range(N_DIRS)]
    return [f"d={i:04d}/src={j}"
            for i in range(MULTI_SPEC[0][1])
            for j in range(MULTI_SPEC[1][1])]


def fab_table(root: str, n_files: int, multi: bool = False) -> None:
    leaves = _leaf_dirs(multi)
    per_dir = max(1, n_files // len(leaves))
    for leaf in leaves:
        dd = os.path.join(root, leaf)
        os.makedirs(dd, exist_ok=True)
        for i in range(per_dir):
            open(os.path.join(dd, f"f-{i:06d}.parquet"), "w").close()


def one_dir_commit(path: str, fs, multi: bool = False
                   ) -> tuple[float, int]:
    """A commit touching ONE dir with TOUCHED_FILES fresh names:
    returns (seconds, manifest bytes written = root claim + shard)."""
    man = M.read_commit(path, fs=fs)
    gen1 = int(man["generation"]) + 1
    d = _leaf_dirs(multi)[0]
    fresh = [f"g{gen1}-{i:06d}.parquet" for i in range(TOUCHED_FILES)]
    t0 = time.perf_counter()
    M._set_dir_files(man, path, d, fresh, fs)
    man["generation"] = gen1
    M._write_commit(path, man, fs)
    dt = time.perf_counter() - t0
    by = fs.getsize(os.path.join(path, f"_commit.{gen1:08d}.json"))
    entry = man["partitions"][d]
    if isinstance(entry, str):
        by += fs.getsize(os.path.join(path, d, entry.lstrip("@")))
    return dt, by


def run_decade(n_files: int, multi: bool = False) -> dict:
    fs = fsops.PosixFS()
    out: dict = {"table_files": n_files,
                 "layout": "d=/src= (2-level)" if multi else "part="}
    pcol = [c for c, _n in MULTI_SPEC] if multi else "part"
    for mode, inline_max in (("sharded", 16), ("inline", 10 ** 9)):
        saved = M.MANIFEST_INLINE_MAX
        M.MANIFEST_INLINE_MAX = inline_max
        tmp = tempfile.mkdtemp(prefix=f"probe9_{mode}_")
        path = os.path.join(tmp, "t")
        try:
            fab_table(path, n_files, multi=multi)
            t0 = time.perf_counter()
            M.manifest_bootstrap(path, pcol, fs=fs)
            boot = time.perf_counter() - t0
            commit_s, commit_b = one_dir_commit(path, fs, multi=multi)
            t0 = time.perf_counter()
            man = M.read_commit(path, fs=fs)
            head = time.perf_counter() - t0
            t0 = time.perf_counter()
            pruned = M.manifest_files(man, path, fs=fs,
                                      dirs=[_leaf_dirs(multi)[0]])
            prune_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            full = M.manifest_files(man, path, fs=fs)
            full_t = time.perf_counter() - t0
            out[mode] = {
                "bootstrap_s": round(boot, 3),
                "one_dir_commit_s": round(commit_s, 4),
                "one_dir_commit_manifest_bytes": commit_b,
                "root_cache_bytes": fs.getsize(
                    os.path.join(path, "_commit.json")),
                "read_head_s": round(head, 4),
                "pruned_list_s": round(prune_t, 4),
                "pruned_list_files": len(pruned),
                "full_list_s": round(full_t, 4),
                "full_list_files": len(full),
            }
        finally:
            M.MANIFEST_INLINE_MAX = saved
            shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    rows = [run_decade(n) for n in (1_000, 10_000, 100_000)]
    rows += [run_decade(100_000, multi=True)]
    print(json.dumps(rows, indent=1))
    s = [r["sharded"]["one_dir_commit_manifest_bytes"] for r in rows]
    i = [r["inline"]["one_dir_commit_manifest_bytes"] for r in rows]
    print("\nsharded commit bytes across decades (+2-level at 1e5):",
          s, "(flat = bound by touched dir + #dirs)")
    print("inline  commit bytes across decades (+2-level at 1e5):",
          i, "(grows with table file count)")


if __name__ == "__main__":
    main()
