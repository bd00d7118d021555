"""Append-only refinement ledger (LEDGER_TPU.json).

VERDICT r3 weak-item 2: the example sweeps used to OVERWRITE their whole
ledger block, so re-running a subset of sizes silently dropped the
converged rows.  `record()` keys each block by (study, backend) and
merges rows by the study's key fields: re-running nb=300 refreshes the
nb=300 row and leaves nb=1200 in place.  A block only ever grows or
refreshes -- regression evidence stops decaying.
"""

from __future__ import annotations

import json
import os
import time


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def record(study: str, rows: list, key_fields: tuple, path: str = None):
    """Merge `rows` into LEDGER_TPU.json under "<study>@<backend>".

    key_fields: row keys identifying a configuration (e.g. ("nb", "M")).
    Rows with a key tuple matching an existing row replace it; all other
    existing rows are retained.  A legacy un-suffixed "<study>" block from
    the pre-r4 format is absorbed on first write if its backend matches.
    Returns the merged block.
    """
    import jax
    backend = jax.default_backend()
    path = path or os.path.join(_repo_root(), "LEDGER_TPU.json")
    ledger = {}
    if os.path.exists(path):
        with open(path) as fh:
            ledger = json.load(fh)
    block_key = f"{study}@{backend}"
    old_rows = []
    if block_key in ledger:
        old_rows = ledger[block_key].get("rows", [])
    legacy = ledger.get(study)
    if legacy and legacy.get("backend") == backend:
        have = {tuple(r.get(k) for k in key_fields) for r in old_rows}
        old_rows += [r for r in legacy.get("rows", [])
                     if tuple(r.get(k) for k in key_fields) not in have]
        del ledger[study]
    new_keys = {tuple(r.get(k) for k in key_fields) for r in rows}
    merged = [r for r in old_rows
              if tuple(r.get(k) for k in key_fields) not in new_keys] + rows

    def sort_key(r):
        return tuple((v is None, v) for v in
                     (r.get(k) for k in key_fields))
    merged.sort(key=sort_key)
    ledger[block_key] = {"rows": merged, "backend": backend,
                         "date": time.strftime("%Y-%m-%d")}
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(ledger, fh, indent=1)
    os.replace(tmp, path)
    return ledger[block_key]
