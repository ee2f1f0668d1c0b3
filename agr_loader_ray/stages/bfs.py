"""Sharded level-synchronized BFS over an implicit (arithmetic) DAG.

The scale problem this stage solves (VERDICT r3 item 4): the driver
frontier-BFS in ``dag_depth_levels`` holds the whole node set (all part
keys) on the driver — fine for ontology-sized inputs (the reference's
closure inputs are <100k edges, ``/root/reference/src/etl/closure_etl.py:28-30``),
wrong for an open-world key stream.  Here the node state is
hash-sharded across ``nshards`` actors:

- **Load**: the key Dataset's block refs are streamed into every shard,
  which keeps only ``key % nshards == shard_id`` members.  Nothing
  node-scale lands on the driver (cost: each block is fetched by all
  shards — P× plasma reads of the pruned key column; a production lake
  keyed by node hash reads 1×, same contract as the engine's bucketed
  partitions).
- **Rounds**: each shard absorbs its incoming candidate arrays, marks
  the previously-unseen members at the round's level, generates the
  fresh nodes' children via a caller-supplied vectorized ``children_fn``
  and fans them out as ONE OBJECT PER DESTINATION SHARD
  (``num_returns`` routing) — so a round's cross-shard traffic is
  frontier-sized and point-to-point, never broadcast.  The driver only
  routes object refs and reads per-round fresh COUNTS (P ints).
- **Result**: per-shard ``(node, level)`` Arrow tables assembled with
  ``ray.data.from_arrow_refs`` — the levels never pass through the
  driver either.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray

_EMPTY = np.empty(0, np.int64)


@ray.remote
class _LevelShard:
    """One hash shard of BFS node state (sorted keys + level array)."""

    def __init__(self, shard_id: int, nshards: int,
                 key_col: str, children_fn: Callable):
        self.sid = shard_id
        self.n = nshards
        self.key_col = key_col
        self.children_fn = children_fn
        self._parts: list[np.ndarray] | None = []
        self.keys = _EMPTY
        self.level = _EMPTY

    def load_block(self, block: pa.Table) -> int:
        k = block[self.key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = k[(k >= 1) & (k % self.n == self.sid)]
        self._parts.append(k)
        return len(k)

    def seal(self) -> int:
        self.keys = (np.unique(np.concatenate(self._parts))
                     if self._parts else _EMPTY)
        self._parts = None
        self.level = np.full(len(self.keys), -1, np.int64)
        return len(self.keys)

    def absorb(self, lv: int, *cands: np.ndarray):
        """Mark unseen candidate members at level ``lv``; return
        ``nshards`` child arrays (one per destination) + fresh count."""
        live = [c for c in cands if len(c)]
        cand = np.unique(np.concatenate(live)) if live else _EMPTY
        i = np.searchsorted(self.keys, cand)
        ok = i < len(self.keys)
        ii, cc = i[ok], cand[ok]
        m = (self.keys[ii] == cc) & (self.level[ii] < 0)
        fresh = cc[m]
        self.level[ii[m]] = lv
        kids = self.children_fn(fresh) if len(fresh) else _EMPTY
        return tuple(kids[kids % self.n == d] for d in range(self.n)) \
            + (int(len(fresh)),)

    def result(self) -> pa.Table:
        m = self.level >= 0
        return pa.table({"node": pa.array(self.keys[m]),
                         "level": pa.array(self.level[m])})


def sharded_levels(
    ds: "ray.data.Dataset",
    key_col: str,
    children_fn: Callable[[np.ndarray], np.ndarray],
    seed_nodes: np.ndarray,
    seed_children: np.ndarray,
    nshards: int = 8,
    max_rounds: int = 128,
) -> "ray.data.Dataset":
    """Run sharded BFS; return a ``(node, level)`` Dataset (unsorted).

    ``seed_nodes`` are absorbed at level 0 (marked only if they are
    members); ``seed_children`` are force-injected as level-1
    candidates so BFS proceeds even when the root itself is not a
    member (matching the driver BFS's ``keys ∪ parents`` node space).
    """
    shards = [_LevelShard.remote(s, nshards, key_col, children_fn)
              for s in range(nshards)]
    loads = []
    for bundle in ds.iter_internal_ref_bundles():
        for bref in bundle.block_refs:
            loads += [sh.load_block.remote(bref) for sh in shards]
    ray.get(loads)
    ray.get([sh.seal.remote() for sh in shards])

    def routed(arr: np.ndarray) -> list:
        return [ray.put(arr[arr % nshards == d]) for d in range(nshards)]

    in_refs = [[r] for r in routed(seed_nodes.astype(np.int64))]
    extra = routed(seed_children.astype(np.int64))
    lv = 0
    for _ in range(max_rounds):
        outs = [shards[s].absorb.options(num_returns=nshards + 1)
                .remote(lv, *in_refs[s]) for s in range(nshards)]
        fresh = sum(ray.get([o[nshards] for o in outs]))
        in_refs = [[outs[src][dst] for src in range(nshards)]
                   for dst in range(nshards)]
        if lv == 0:  # inject the forced level-1 seeds once
            for dst in range(nshards):
                in_refs[dst].append(extra[dst])
        elif fresh == 0:
            break
        lv += 1
    else:
        raise RuntimeError(f"sharded BFS not converged in {max_rounds} rounds")
    return ray.data.from_arrow_refs(
        [sh.result.remote() for sh in shards])
