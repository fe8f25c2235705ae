"""StableLogMergePolicy — a from-scratch Python port of the reference's
default merge policy (behavioral spec:
quickwit-indexing/src/merge_policy/stable_log_merge_policy.rs:99-298;
defaults: merge_factor 10, max 12, min_level_num_docs 100k,
split_num_docs_target 10M — merge_policy_config.rs:91-117,
index_config/mod.rs:139-141).

Algorithm over manifest segment rows:
  1. mature segments (num_docs >= split_num_docs_target) never merge;
  2. sort remaining by (reverse time_end [missing last], num_docs,
     segment_id) — the segment_id tiebreak makes the policy invariant to
     input shuffling;
  3. group into levels: level boundary triples (l0 = max(3*first.num_docs,
     min_level_num_docs); next level starts when num_docs >= boundary, new
     boundary = 3*num_docs), capped by split_num_docs_target;
  4. per level (deepest first), take the longest suffix of the level that
     stays under max_merge_factor and split_num_docs_target; emit it if it
     reaches merge_factor (or got capped).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..config import MergePolicyConfig

TOO_SMALL, VALID, TOO_BIG = 0, 1, 2


@dataclass
class MergeOperation:
    segments: list[dict]

    def segment_ids(self) -> list[str]:
        return [s["segment_id"] for s in self.segments]


def _sort_key(seg: dict):
    te = seg.get("time_end")
    # reverse time end, None (no timestamp) after all values
    rev_te = (0, -te) if te is not None else (1, 0)
    return (rev_te, seg["num_docs"], seg["segment_id"])


class StableLogMergePolicy:
    def __init__(self, config: MergePolicyConfig | None = None):
        self.config = config or MergePolicyConfig()

    def is_mature(self, seg: dict) -> bool:
        return seg["num_docs"] >= self.config.split_num_docs_target

    def operations(self, segments: list[dict]) -> list[MergeOperation]:
        if len(segments) < 2:
            return []
        splits = sorted((s for s in segments if not self.is_mature(s)),
                        key=_sort_key)
        if not splits:
            return []
        levels = self._build_levels(splits)
        ops: list[MergeOperation] = []
        for lo, hi in reversed(levels):
            # emit EVERY disjoint candidate in the level, right to left —
            # the reference's continuous planner reaches the same merges
            # over successive cycles (stable_log_merge_policy.rs:99-150);
            # emitting them in one pass lets a batch round run them in
            # parallel instead of one-op-per-round re-planning
            end = hi
            while True:
                rng = self._candidate_from_level(splits, lo, end)
                if rng is None:
                    break
                ops.append(MergeOperation(splits[rng[0]:rng[1]]))
                end = rng[0]
        return ops

    def _build_levels(self, splits: list[dict]) -> list[tuple[int, int]]:
        assert all(s["num_docs"] < self.config.split_num_docs_target
                   for s in splits)
        levels: list[tuple[int, int]] = []
        start = 0
        max_docs = max(splits[0]["num_docs"] * 3,
                       self.config.min_level_num_docs)
        for ord_, s in enumerate(splits):
            if s["num_docs"] >= max_docs:
                levels.append((start, ord_))
                start = ord_
                max_docs = 3 * s["num_docs"]
        levels.append((start, len(splits)))
        return levels

    def _candidate_from_level(self, splits: list[dict], lo: int, hi: int):
        end = hi
        start = end
        for ord_ in range(hi - 1, lo - 1, -1):
            if self._candidate_size(splits[start:end]) == TOO_BIG:
                break
            start = ord_
        if self._candidate_size(splits[start:end]) == TOO_SMALL:
            return None
        return (start, end)

    def _candidate_size(self, cand: list[dict]) -> int:
        if len(cand) <= 1:
            return TOO_SMALL
        if len(cand) >= self.config.max_merge_factor:
            return TOO_BIG
        total = sum(s["num_docs"] for s in cand)
        if total >= self.config.split_num_docs_target:
            return TOO_BIG
        if len(cand) < self.config.merge_factor:
            return TOO_SMALL
        return VALID


class ConstWriteAmplificationMergePolicy:
    """Alternative policy bounding write amplification (behavioral spec:
    quickwit-indexing/src/merge_policy/const_write_amplification.rs:28-120,
    defaults merge_factor 10 / max 12, max_merge_ops 4 —
    merge_policy_config.rs:99-101): every segment is merged at most
    max_merge_ops times in its lifetime, and only segments with the SAME
    num_merge_ops merge together (so each doc is rewritten <= max_merge_ops
    times total)."""

    def __init__(self, config: MergePolicyConfig | None = None,
                 max_merge_ops: int = 4):
        self.config = config or MergePolicyConfig()
        self.max_merge_ops = max_merge_ops

    def is_mature(self, seg: dict) -> bool:
        return (seg["num_docs"] >= self.config.split_num_docs_target
                or seg.get("num_merge_ops", 0) >= self.max_merge_ops)

    def operations(self, segments: list[dict]) -> list[MergeOperation]:
        by_ops: dict[int, list[dict]] = {}
        for s in segments:
            if not self.is_mature(s):
                by_ops.setdefault(s.get("num_merge_ops", 0), []).append(s)
        ops: list[MergeOperation] = []
        for level in sorted(by_ops):
            group = sorted(by_ops[level], key=_sort_key)
            # full batches of merge_factor (up to max_merge_factor when the
            # remainder would be left under-sized)
            i = 0
            while len(group) - i >= self.config.merge_factor:
                take = self.config.merge_factor
                rest = len(group) - i - take
                if 0 < rest < self.config.merge_factor and \
                        take + rest <= self.config.max_merge_factor:
                    take += rest
                ops.append(MergeOperation(group[i:i + take]))
                i += take
        return ops
