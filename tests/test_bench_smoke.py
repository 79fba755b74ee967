"""Bit-rot guard for the benchmark entry points' multi-device branches.

On this harness only one real chip exists, so `bench.bench_multichip` and
the benchmark scripts' ring paths never execute in anger; this smoke test
compiles and runs them on a 2-device slice of the virtual CPU mesh at tiny
shapes so signature or shard_map drift is caught by the suite (<30s).
"""

import pytest


@pytest.fixture()
def tiny(monkeypatch):
    """Shrink the benchmark modules' shape globals to CPU-friendly sizes."""
    import bench
    from benchmark import benchmark_kvpacked_func as bkv
    from benchmark import benchmark_varlen_kvpacked_func as bvar

    for mod in (bench,):
        monkeypatch.setattr(mod, "B", 1)
        monkeypatch.setattr(mod, "HQ", 4)
        monkeypatch.setattr(mod, "HKV", 2)
        monkeypatch.setattr(mod, "S", 128)
        monkeypatch.setattr(mod, "D", 32)
    monkeypatch.setattr(bkv, "HQ", 4)
    monkeypatch.setattr(bkv, "HKV", 2)
    monkeypatch.setattr(bkv, "SEQ", 128)
    monkeypatch.setattr(bkv, "D", 32)
    monkeypatch.setattr(bkv, "SCALE", 32**-0.5)
    return bench, bkv, bvar


def test_bench_multichip_smoke(devices8, tiny):
    bench, _, _ = tiny
    res = bench.bench_multichip(2)
    assert res["metric"] == "zigzag_fwd_bwd_frac_of_flash_roofline"
    assert 0.0 < res["value"]


@pytest.mark.parametrize("name", ["ring", "zigzag", "stripe"])
def test_benchmark_variant_smoke(devices8, tiny, name):
    _, bkv, _ = tiny
    dt = bkv.bench_variant(name, 2, fwd_only=(name == "ring"))
    assert dt > 0


def test_benchmark_varlen_smoke(devices8, tiny, monkeypatch):
    """The varlen benchmark's distributed paths on a 2-device mesh."""
    _, _, bvar = tiny
    monkeypatch.setattr(bvar, "HQ", 4)
    monkeypatch.setattr(bvar, "HKV", 2)
    monkeypatch.setattr(bvar, "D", 32)
    monkeypatch.setattr(bvar, "SCALE", 32**-0.5)
    monkeypatch.setattr(bvar, "SEQ_PER_DEV", 128)
    bvar.run(2, fwd_only=True)
