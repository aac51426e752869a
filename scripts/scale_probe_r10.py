"""Round-10 scale probe: the disjoint-partition commit REBASE and the
claim-retention (time-travel) window at the module's stated target
(10^5 table files).

VERDICT r9 items 2-3 + the honesty-loop rule (three-decade probes for
anything new): prove that

  1. a LOSER's rebase costs O(intervening claims x claim bytes) —
     one claim read + conflict check + re-claim per intervening
     winner — and is FLAT across table file decades (claims stay
     O(#dirs) under sharding, so the walk never touches data or
     shard files of untouched dirs);
  2. vacuum_manifested(keep_claims=K) retains K generations fully
     readable (their whole file lists resolve) at a cost bound by
     on-disk files, and generation resolution for time travel is one
     claim read regardless of table size.

Same methodology as scripts/scale_probe_r9.py: the REAL commit layer
(manifest_bootstrap, _set_dir_files, _write_commit's rebase loop,
read_commit, manifest_files, vacuum_manifested, read claim-at-gen)
over fabricated layouts — empty `.parquet`-named files, since the
metadata protocol only ever lists names.  Spark is uninvolved; the
data-append cost is measured by the bench's real upsert entries.

Usage: python scripts/scale_probe_r10.py
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
TOUCHED_FILES = 1_000          # fresh committed names per touched dir


def _dirs() -> list[str]:
    return [f"part={i:04d}" for i in range(N_DIRS)]


def fab_table(root: str, n_files: int) -> None:
    per_dir = max(1, n_files // N_DIRS)
    for d in _dirs():
        dd = os.path.join(root, d)
        os.makedirs(dd, exist_ok=True)
        for i in range(per_dir):
            open(os.path.join(dd, f"f-{i:06d}.parquet"), "w").close()


def _commit_one_dir(path: str, fs, man: dict, d: str,
                    tag: str) -> dict:
    """Protocol-level one-dir commit from `man`'s base: fresh names
    into `d`, next generation claimed (with rebase) — returns the
    manifest that actually committed."""
    fresh = [f"{tag}-{i:06d}.parquet" for i in range(TOUCHED_FILES)]
    for f in fresh:
        open(os.path.join(path, d, f), "w").close()
    M._set_dir_files(man, path, d, fresh, fs)
    man["generation"] = int(man["generation"]) + 1
    return M._write_commit(path, man, fs, touched=[d])


def probe_rebase(path: str, fs, k_winners: int) -> dict:
    """A loser whose base is k_winners generations stale: its
    _write_commit walks every intervening claim (disjoint dirs) and
    re-claims.  Times ONLY the loser's claim call — the rebase loop
    itself."""
    import copy

    base = M.read_commit(path, fs=fs)
    loser = copy.deepcopy(base)
    # winners: one generation each, dirs 1..k (disjoint from dir k+1)
    for k in range(k_winners):
        winner = M.read_commit(path, fs=fs)
        _commit_one_dir(path, fs, winner, _dirs()[1 + k], f"w{k}")
    # loser computed against the stale base, touching its own dir
    d = _dirs()[1 + k_winners]
    fresh = [f"loser-{i:06d}.parquet" for i in range(TOUCHED_FILES)]
    for f in fresh:
        open(os.path.join(path, d, f), "w").close()
    M._set_dir_files(loser, path, d, fresh, fs)
    loser["generation"] = int(loser["generation"]) + 1
    t0 = time.perf_counter()
    committed = M._write_commit(path, loser, fs, touched=[d])
    dt = time.perf_counter() - t0
    gen = int(committed["generation"])
    assert gen == int(base["generation"]) + k_winners + 1
    return {"k_winners": k_winners,
            "rebase_claim_s": round(dt, 4),
            "claim_bytes": fs.getsize(M._claim_file(path, gen))}


def probe_retention(path: str, fs) -> dict:
    """Five single-dir generations, vacuum keep_claims=3: the two
    oldest claims retire, the retained window stays fully readable
    (whole file list resolves at head-2), and resolving an old
    generation costs one claim read."""
    for g in range(5):
        man = M.read_commit(path, fs=fs)
        _commit_one_dir(path, fs, man, _dirs()[g % N_DIRS], f"r{g}")
    head = int(M.read_commit(path, fs=fs)["generation"])
    t0 = time.perf_counter()
    removed = M.vacuum_manifested(path, keep_claims=3)
    vac = time.perf_counter() - t0
    gens = M.manifest_generations(path, fs=fs)
    assert gens == [head - 2, head - 1, head], gens
    # time-travel resolution: one claim read, then the pruned or full
    # list builds exactly as for the head
    t0 = time.perf_counter()
    old = json.loads(fs.read_text(M._claim_file(path, head - 2)))
    resolve = time.perf_counter() - t0
    t0 = time.perf_counter()
    full = M.manifest_files(old, path, fs=fs)
    list_t = time.perf_counter() - t0
    return {"vacuum_keep3_s": round(vac, 3),
            "vacuum_removed_files": removed,
            "live_generations": gens,
            "resolve_old_gen_s": round(resolve, 5),
            "old_gen_full_list_s": round(list_t, 4),
            "old_gen_files": len(full)}


def run_decade(n_files: int) -> dict:
    fs = fsops.PosixFS()
    out: dict = {"table_files": n_files}
    tmp = tempfile.mkdtemp(prefix="probe10_")
    path = os.path.join(tmp, "t")
    try:
        fab_table(path, n_files)
        M.manifest_bootstrap(path, "part", fs=fs)
        out["rebase_k1"] = probe_rebase(path, fs, 1)
        out["rebase_k8"] = probe_rebase(path, fs, 8)
        out["retention"] = probe_retention(path, fs)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    rows = [run_decade(n) for n in (1_000, 10_000, 100_000)]
    print(json.dumps(rows, indent=1))
    r1 = [r["rebase_k1"]["rebase_claim_s"] for r in rows]
    r8 = [r["rebase_k8"]["rebase_claim_s"] for r in rows]
    cb = [r["rebase_k1"]["claim_bytes"] for r in rows]
    print("\nrebase(k=1) seconds across decades:", r1,
          "(flat = walk cost independent of table files)")
    print("rebase(k=8) seconds across decades:", r8,
          "(~8x k=1, still flat across decades)")
    print("claim bytes across decades:", cb,
          "(flat = O(#dirs) under sharding)")


if __name__ == "__main__":
    main()
