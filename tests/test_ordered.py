"""Order-based wavelet path: distributed build == sequential reconstruction
under the DistributedWaveletsManager index contract."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from condor_ray.engine.ordered import build_windowed_wavelets, wavelet_range_sums
from condor_ray.sources.transcripts import read_transcripts, transcript_fragments
from condor_ray.synopses import Synopsis
from condor_ray.windows import TumblingWindow

W = TumblingWindow(120_000)


@pytest.fixture(scope="module")
def wavelet_out(ray_session, tiny_fixture):
    ds = read_transcripts(tiny_fixture)
    out = build_windowed_wavelets(ds, W, size=4096, parallelism=4).to_pandas()
    frames = [pq.read_table(f).to_pandas() for f in transcript_fragments(tiny_fixture)]
    df = pd.concat(frames, ignore_index=True)
    return out, df


class TestWaveletWindows:
    def test_point_reconstruction(self, wavelet_out):
        out, df = wavelet_out
        ts = df["ts"].astype("int64")
        df = df.assign(ts_us=ts, wid=ts // W.size_us)
        for _, row in out.head(3).iterrows():
            wid = row["window_start"] // W.size_us
            g = df[df["wid"] == wid].sort_values(
                ["ts_us", "conv_id", "turn_idx"], kind="mergesort"
            )
            values = g["text"].str.len().to_numpy(dtype=np.float64)
            mgr = Synopsis.from_bytes(row["payload"])
            n = len(values)
            assert row["n_rows"] == n
            # budget 4096 >> values per window: lossless reconstruction on
            # the dyadic prefix of each round-robin substream
            P = mgr.parallelism
            for i in range(0, n, max(1, n // 17)):
                local_n = mgr.unified_synopses[i % P].stream_element_counter
                prefix = 2 ** int(np.log2(max(local_n, 1)))
                if i // P < prefix:
                    assert mgr.point_query(i) == pytest.approx(values[i], abs=1e-6)

    def test_range_sum_accuracy(self, ray_session, tiny_fixture, wavelet_out):
        out, df = wavelet_out
        ds = read_transcripts(tiny_fixture)
        sums = wavelet_range_sums(
            ds, W, [(0.0, 1.0)], size=4096, parallelism=4
        ).to_pandas()
        ts = df["ts"].astype("int64")
        df = df.assign(ts_us=ts, wid=ts // W.size_us)
        for _, r in sums.iterrows():
            wid = r["window_start"] // W.size_us
            g = df[df["wid"] == wid].sort_values(
                ["ts_us", "conv_id", "turn_idx"], kind="mergesort"
            )
            exact = g["text"].str.len().to_numpy()[int(r["left"]) : int(r["right"]) + 1].sum()
            # non-dyadic tails are approximate (reference padding semantics)
            assert r["range_sum"] == pytest.approx(exact, rel=0.25)

    def test_manager_serde_roundtrip(self, wavelet_out):
        out, _ = wavelet_out
        mgr = Synopsis.from_bytes(out["payload"].iloc[0])
        rt = Synopsis.from_bytes(mgr.to_bytes())
        assert rt.parallelism == mgr.parallelism
        assert rt.elements_processed == mgr.elements_processed
        n = rt.elements_processed
        for i in (0, n // 2, n - 1):
            assert rt.point_query(i) == pytest.approx(mgr.point_query(i))


class TestFusedWindowBuild:
    def test_fused_path_bit_identical(self, ray_session, tiny_fixture):
        """intra_window_parallel=False (one fused task per window) must
        produce bit-identical managers to the 3-stage parallel path."""
        from condor_ray.config import KeySpec
        from condor_ray.engine.ordered import build_windowed_wavelets
        from condor_ray.sources.transcripts import read_transcripts
        from condor_ray.windows import TumblingWindow

        ds = read_transcripts(tiny_fixture, columns=["conv_id", "turn_idx", "ts"])
        kw = dict(size=128, parallelism=3, key=KeySpec("turn_idx", "value"))
        a = (
            build_windowed_wavelets(
                ds, TumblingWindow(60_000), intra_window_parallel=True, **kw
            )
            .to_pandas()
            .sort_values("window_start")
            .reset_index(drop=True)
        )
        b = (
            build_windowed_wavelets(
                ds, TumblingWindow(60_000), intra_window_parallel=False, **kw
            )
            .to_pandas()
            .sort_values("window_start")
            .reset_index(drop=True)
        )
        assert len(a) == len(b) > 0
        assert (a["n_rows"].values == b["n_rows"].values).all()
        assert all(x == y for x, y in zip(a["payload"], b["payload"]))
