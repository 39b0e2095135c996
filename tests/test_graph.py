"""Distributed connected components / dedup keep-list
(condor_ray/pipelines/graph.py) vs a sequential union-find oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from condor_ray.pipelines.graph import connected_components, dedup_keep_list


def _uf_components(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _pairs_ds(pairs):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_a": np.array([a for a, _ in pairs], dtype=np.int64),
                "doc_b": np.array([b for _, b in pairs], dtype=np.int64),
            }
        )
    )


class TestConnectedComponents:
    def test_random_graph_plus_chain_matches_union_find(self, ray_session):
        rng = np.random.default_rng(0)
        pairs = [
            (int(a), int(b)) for a, b in rng.integers(0, 400, (300, 2)) if a != b
        ]
        # a 60-link chain of increasing ids: min label must walk multi-hop
        # (pointer jumping keeps rounds logarithmic)
        pairs += [(10_000 + i, 10_000 + i + 1) for i in range(60)]
        nodes = sorted({x for p in pairs for x in p})
        expected = _uf_components(pairs, nodes)

        res = connected_components(_pairs_ds(pairs), n_parts=8).to_pandas()
        got = dict(zip(res["doc_id"], res["component"]))
        assert len(got) == len(nodes)
        assert all(got[n] == expected[n] for n in nodes)

    def test_duplicate_and_reversed_edges(self, ray_session):
        pairs = [(1, 2), (2, 1), (1, 2), (3, 2), (7, 7)]
        res = connected_components(_pairs_ds(pairs), n_parts=4).to_pandas()
        got = dict(zip(res["doc_id"], res["component"]))
        assert got == {1: 1, 2: 1, 3: 1, 7: 7}

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_property_random_graphs_match_union_find(self, ray_session, seed):
        """Property sweep over graph shapes the delta-propagation and
        pointer-jumping logic must survive: sparse random + hub star
        (extreme degree skew) + long chain, varying density per seed."""
        rng = np.random.default_rng(seed)
        n_nodes = int(rng.integers(50, 500))
        n_edges = int(rng.integers(20, 800))
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, n_nodes, (n_edges, 2))
        ]
        hub = int(rng.integers(0, n_nodes))
        pairs += [(hub, int(x)) for x in rng.integers(0, n_nodes, 40)]
        pairs += [(50_000 + i, 50_000 + i + 1) for i in range(int(rng.integers(5, 80)))]
        nodes = sorted({x for p in pairs for x in p})
        expected = _uf_components(pairs, nodes)
        res = connected_components(_pairs_ds(pairs), n_parts=5).to_pandas()
        got = dict(zip(res["doc_id"], res["component"]))
        assert len(got) == len(nodes)
        assert all(got[n] == expected[n] for n in nodes)

    def test_empty_pair_list(self, ray_session):
        res = connected_components(_pairs_ds([]), n_parts=4).to_pandas()
        assert len(res) == 0


class TestDedupKeepList:
    def test_keep_one_representative_per_cluster(self, ray_session):
        import ray.data as rd

        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64)})
        )
        pairs = _pairs_ds([(1, 2), (2, 3), (7, 8)])
        res = dedup_keep_list(docs, pairs, n_parts=4).to_pandas()
        res = res.sort_values("doc_id").reset_index(drop=True)
        assert len(res) == 10
        got = {
            int(r.doc_id): (int(r.component), bool(r.keep))
            for r in res.itertuples()
        }
        # clustered docs: one keeper (the min id)
        assert got[1] == (1, True)
        assert got[2] == (1, False)
        assert got[3] == (1, False)
        assert got[7] == (7, True)
        assert got[8] == (7, False)
        # unpaired docs keep themselves
        for n in (0, 4, 5, 6, 9):
            assert got[n] == (n, True)
        # exactly one keeper per component
        keepers = res[res["keep"]].groupby("component").size()
        assert (keepers == 1).all()


class TestChainConvergence:
    def test_long_chain_converges_within_default_rounds(self, ray_session):
        """A random-id chain is the pointer-jump scheme's worst case: without
        the Shiloach-Vishkin hook step it needs ~n/2 rounds (measured 1609
        for 4000 docs) and silently returned WRONG components past
        max_iters; with hooks it is O(log n) (23 rounds at 4000)."""
        rng = np.random.default_rng(11)
        ids = rng.permutation(30_000)[:3000].astype(np.int64)
        pairs = list(zip(ids[:-1].tolist(), ids[1:].tolist()))
        res = connected_components(_pairs_ds(pairs), n_parts=6).to_pandas()
        assert len(res) == 3000
        assert (res["component"] == ids.min()).all()

    def test_non_convergence_raises_not_silent(self, ray_session):
        """Exhausting max_iters with labels still changing must raise —
        a silently-unconverged result emits multiple keeps per cluster."""
        rng = np.random.default_rng(13)
        ids = rng.permutation(9_000)[:900].astype(np.int64)
        pairs = list(zip(ids[:-1].tolist(), ids[1:].tolist()))
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(_pairs_ds(pairs), n_parts=4, max_iters=2)
