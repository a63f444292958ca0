"""Sharded exact membership with Bloom-prefiltered all_to_all query routing.

SURVEY.md §2.3 (last row): when the replicated membership structure exceeds
per-chip HBM, shard it and route queries. The solid-set key array is sorted,
so sharding by CONTIGUOUS KEY RANGE over the mesh keeps every shard
binary-searchable; a small replicated Bloom filter (ops/bloom.py, 12
bits/key — ~5x smaller than the key plane) prefilters queries so only
Bloom-positive ones consume routing capacity:

  per device (shard_map over the mesh axis):
    1. probe the replicated Bloom for the local query slice — negatives are
       EXACT (one-sided error) and resolved immediately as absent;
    2. positives route to their owner device (searchsorted over the
       replicated shard-boundary keys) via fixed-capacity all_to_all (ICI),
       carrying their origin lane id;
    3. the owner binary-searches its local sorted shard (exact — Bloom false
       positives die here);
    4. verdicts route back through the mirror all_to_all and scatter into
       lane order.

Exactness: negatives by the Bloom's one-sided guarantee, positives by the
owner's exact search. The reference's Bloom+cFP plays the same role on one
node (src/Finder.cpp:243-246); this is its multi-chip shape.
"""

from __future__ import annotations

from functools import partial

import numpy as np

_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


class ShardedMembership:
    """Holds a sorted canonical key set sharded by key range over a mesh,
    plus the replicated Bloom prefilter. `contains(keys)` is exact."""

    def __init__(self, mesh, sorted_keys: np.ndarray, bits_per_key: int = 12,
                 cap_factor: float = 1.25):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops import bloom

        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_dev = int(mesh.devices.size)
        keys = np.ascontiguousarray(sorted_keys, np.uint64)
        n = keys.size
        # pad so the key plane splits evenly; the sentinel never matches a
        # canonical k-mer (canonical < revcomp(all-G) for every k <= 32)
        per = -(-max(n, self.n_dev) // self.n_dev)
        padded = np.full(per * self.n_dev, _SENTINEL, np.uint64)
        padded[:n] = keys
        # first key of each shard: owner(q) = #boundaries <= q - 1
        self._bounds = padded[::per].copy()
        self._per = per
        self._cap_factor = cap_factor

        shard = NamedSharding(mesh, P(self.axis))
        rep = NamedSharding(mesh, P())
        self._keys_d = jax.device_put(jnp.asarray(padded), shard)
        bf = bloom.build(keys if n else np.zeros(1, np.uint64), bits_per_key)
        self._bloom_bits = jax.device_put(jnp.asarray(bf.bits), rep)
        self._bloom_log = bf.log_bits
        self._bloom_nh = bf.n_hash
        self._bounds_d = jax.device_put(jnp.asarray(self._bounds), rep)
        self._fns = {}

    @property
    def nbytes_per_shard(self):
        return self._per * 8

    def _build_fn(self, lanes_per_dev: int, cap: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.axis
        n = self.n_dev
        log_bits = self._bloom_log
        n_hash = self._bloom_nh

        from ..ops.bloom import _CONSTS

        def shard_fn(queries, shard_keys, bloom_bits, bounds):
            q = queries[0]  # [L]
            # 1. replicated Bloom probe (one-sided: negatives exact)
            pos = jnp.ones(q.shape, bool)
            for c in _CONSTS[:n_hash]:
                h = (q ^ (q >> jnp.uint64(33))) * c
                h = h ^ (h >> jnp.uint64(29))
                p = h >> jnp.uint64(64 - log_bits)
                w = (p >> jnp.uint64(5)).astype(jnp.int32)
                b = (p & jnp.uint64(31)).astype(jnp.uint32)
                pos = pos & ((bloom_bits[w] >> b) & jnp.uint32(1)).astype(bool)

            # 2. owner routing for positives, fixed-capacity buckets
            owner = jnp.clip(
                jnp.searchsorted(bounds, q, side="right").astype(jnp.int32) - 1, 0, n - 1
            )
            owner = jnp.where(pos, owner, n)  # negatives -> no bucket
            order = jnp.argsort(owner)
            q_s = q[order]
            lane_s = order.astype(jnp.int32)
            starts = jnp.searchsorted(owner[order], jnp.arange(n, dtype=jnp.int32)).astype(jnp.int32)
            ends = jnp.concatenate(
                [starts[1:], jnp.searchsorted(owner[order], jnp.int32(n)).astype(jnp.int32)[None]]
            )
            idx = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
            mask = idx < ends[:, None]
            idx = jnp.minimum(idx, q.shape[0] - 1)
            send_q = jnp.where(mask, q_s[idx], _SENTINEL)
            send_lane = jnp.where(mask, lane_s[idx], jnp.int32(-1))
            overflow = jnp.max(ends - starts) > cap

            recv_q = jax.lax.all_to_all(send_q, axis, split_axis=0, concat_axis=0)
            recv_lane = jax.lax.all_to_all(send_lane, axis, split_axis=0, concat_axis=0)

            # 3. exact binary search on the local sorted shard
            flat_q = recv_q.reshape(-1)
            i = jnp.clip(jnp.searchsorted(shard_keys, flat_q), 0, shard_keys.shape[0] - 1)
            found = (shard_keys[i] == flat_q).reshape(n, cap)

            # 4. route verdicts back and scatter into lane order
            back = jax.lax.all_to_all(found, axis, split_axis=0, concat_axis=0)
            back_lane = jax.lax.all_to_all(recv_lane, axis, split_axis=0, concat_axis=0)
            out = jnp.zeros(q.shape, bool)
            bl = back_lane.reshape(-1)
            out = out.at[jnp.maximum(bl, 0)].max(
                jnp.where(bl >= 0, back.reshape(-1), False)
            )
            return out[None, :], overflow[None]

        mapped = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(P(axis, None), P(axis), P(), P()),
            out_specs=(P(axis, None), P(axis)),
        )
        jitted = jax.jit(mapped)
        sharding = NamedSharding(self.mesh, P(axis, None))

        def run(rows):
            return jitted(
                jax.device_put(jnp.asarray(rows), sharding),
                self._keys_d, self._bloom_bits, self._bounds_d,
            )

        return run

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Exact vectorized membership for a host batch of canonical keys."""
        import math

        keys = np.asarray(keys, np.uint64)
        nq = keys.size
        if nq == 0:
            return np.zeros(0, bool)
        lanes = -(-nq // self.n_dev)
        lanes = max(64, 1 << math.ceil(math.log2(lanes)))
        cap = int(lanes * self._cap_factor / self.n_dev) + 64
        fn_key = (lanes, cap)
        if fn_key not in self._fns:
            self._fns[fn_key] = self._build_fn(lanes, cap)
        rows = np.full((self.n_dev, lanes), _SENTINEL, np.uint64)
        flat = rows.reshape(-1)
        flat[:nq] = keys
        out, overflow = self._fns[fn_key](rows)
        out = np.asarray(out).reshape(-1)[:nq]
        if bool(np.asarray(overflow).any()):  # pragma: no cover - cap is generous
            # exact host fallback for this batch
            idx = np.minimum(np.searchsorted(self._sorted_host(), keys), self._n_host() - 1)
            return self._sorted_host()[idx] == keys
        return out

    def _sorted_host(self):
        if not hasattr(self, "_host_keys"):
            self._host_keys = np.asarray(self._keys_d)
        return self._host_keys

    def _n_host(self):
        return max(self._sorted_host().size, 1)
