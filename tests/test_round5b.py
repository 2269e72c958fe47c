"""Round-5 widening: lake maintenance (CDC diff, SCD2 merge), hourly
resample + forward-fill, multi-source BFS, BPE pair counts, int8
embedding quantization — invariant tests beyond the DuckDB oracles."""

from __future__ import annotations

from collections import defaultdict

from mathorcup_spark import registry

SF_DIR = "/root/testdata/sf0.001"


def _rows(name, spark):
    registry._bootstrap()
    return registry.REGISTRY[name].fn(spark, SF_DIR).collect()


def test_snapshot_diff_change_classes(spark):
    rows = _rows("lake_snapshot_diff", spark)
    assert rows
    for r in rows:
        k = r["c_custkey"]
        if r["change_type"] == "insert":
            assert k % 10 == 3 and r["old_acctbal"] is None
        elif r["change_type"] == "delete":
            assert k % 10 == 7 and r["new_acctbal"] is None
        else:
            assert r["change_type"] == "update"
            assert k % 7 == 0 and k % 10 not in (3, 7)
            assert abs(r["new_acctbal"] - r["old_acctbal"] - 100) < 1e-9


def test_scd2_merge_version_chains(spark):
    rows = _rows("lake_scd2_merge", spark)
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["c_custkey"]].append(r)
    assert by_key
    for k, vers in by_key.items():
        current = [v for v in vers if v["is_current"] == 1]
        assert len(current) == 1, f"key {k}: exactly one current version"
        assert current[0]["eff_to"] is None
        if k % 5 == 0:
            assert len(vers) == 2
            closed = next(v for v in vers if v["is_current"] == 0)
            # the closed version ends exactly where the new one starts
            assert str(closed["eff_to"]) == str(current[0]["eff_from"])
            assert abs(current[0]["acctbal"] - closed["acctbal"] - 50) < 1e-9
        else:
            assert len(vers) == 1


def test_resample_grid_is_contiguous_and_filled(spark):
    rows = _rows("ts_resample_ffill", spark)
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    assert by_user
    for u, grid in by_user.items():
        grid.sort(key=lambda r: r["hour"])
        # first grid hour contains the user's first event: never carried
        assert grid[0]["carried"] == 0 and grid[0]["value"] is not None
        prev = None
        for r in grid:
            if prev is not None:
                assert (r["hour"] - prev["hour"]).total_seconds() == 3600, (
                    f"user {u}: grid gap"
                )
                if r["carried"] == 1:
                    assert r["value"] == prev["value"], (
                        f"user {u}: carried row must repeat the last value"
                    )
            prev = r


def test_bfs_seed_and_frontier_invariants(spark):
    rows = _rows("g_bfs_distance", spark)
    dist = {r["node"]: r["dist"] for r in rows}
    assert dist
    seeds = {n for n, d in dist.items() if d == 0}
    # seeds are exactly the node%20==0 members of the graph
    assert seeds and all(n % 20 == 0 for n in seeds)
    assert set(dist.values()) <= {0, 1, 2, 3, 4}
    # bipartite node encoding: odd nodes (parts) sit at odd distances
    # from the all-even (supplier) seed set
    for n, d in dist.items():
        assert d % 2 == n % 2


def test_bpe_pair_counts_ranking(spark):
    rows = sorted(_rows("t_bpe_pair_counts", spark), key=lambda r: r["rnk"])
    assert [r["rnk"] for r in rows] == list(range(1, 41))
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(
        len(r["pair"]) == 2 and r["pair"].islower() and r["pair"].isalpha()
        for r in rows
    )


def test_quantize_error_bound(spark):
    rows = _rows("sim_quantize_int8", spark)
    assert len(rows) == 500
    for r in rows:
        assert r["n_dims"] == 64
        assert 0 < r["max_q"] <= 127
        assert r["scale"] > 0
        # per-element error is at most half a quantization step
        # (scale/254); the rmse cannot exceed it
        assert r["rmse"] <= r["scale"] / 254 + 1e-9
