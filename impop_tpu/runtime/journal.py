"""Per-window result journal with idempotent resume.

The reference's fault story is skip-window-and-continue with no checkpoint
(run_pica2_impg.sh:168-180; a killed scan restarts from scratch, SURVEY.md
§5).  The journal records each completed window as one JSONL record keyed by
its region string; on restart, completed regions are skipped (resume = set
difference) and failed extractions are recorded as NA rows, matching the
reference's NA semantics (run_fst_impg.sh:213-216).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional, Set

__all__ = ["ResultJournal"]


class ResultJournal:
    """Append-only JSONL journal of per-window results."""

    def __init__(self, path: Optional[str]):
        self.path = path
        self._done: Set[str] = set()
        self._records: Dict[str, dict] = {}
        if path and os.path.exists(path):
            with open(path) as handle:
                for line in handle:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn tail write from a killed run
                    key = rec.get("region")
                    if key:
                        self._done.add(key)
                        self._records[key] = rec

    @property
    def completed(self) -> Set[str]:
        return set(self._done)

    def pending(self, regions: Iterable[str]) -> List[str]:
        """Regions not yet journaled, preserving order."""
        return [r for r in regions if r not in self._done]

    def record(self, region: str, payload: dict) -> None:
        rec = {"region": region, **payload}
        self._done.add(region)
        self._records[region] = rec
        if self.path:
            with open(self.path, "a") as handle:
                handle.write(json.dumps(rec) + "\n")

    def record_failure(self, region: str, reason: str) -> None:
        self.record(region, {"status": "NA", "reason": reason})

    def get(self, region: str) -> Optional[dict]:
        return self._records.get(region)
