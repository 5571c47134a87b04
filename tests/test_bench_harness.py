"""Bench harness plumbing: seed-chain replay and schedule windows."""

from stark_mlwe_tpu.bench import (PRESETS, k_min_for_schedule,
                                  ks_for_schedule, witness_seed_for)


def test_schedule_windows():
    assert k_min_for_schedule([16, 16, 8]) == 11
    assert k_min_for_schedule([128]) == 7
    assert k_min_for_schedule([128, 128]) == 14
    assert ks_for_schedule([16, 16, 8]) == list(range(11, 20))
    assert ks_for_schedule([128, 128]) == list(range(14, 20))


def test_append_baseline_reparse():
    """BENCH_APPEND=1 re-derives the paper delta baseline from recorded
    CSV rows; the csv_line round-trips through that parse."""
    from stark_mlwe_tpu.bench import csv_line

    line = csv_line("paper", 16, [16, 16, 8], 101600, 0.911, 15.4)
    p = line.split(",")
    assert p[0] == "csv" and p[1] == "paper"
    base = {"proof_bytes": int(p[4]), "prove_s": float(p[5]),
            "verify_ms": float(p[6]), "eps": float(p[7])}
    assert base["proof_bytes"] == 101600
    assert abs(base["eps"] - (1 << 16) / 0.911) < 1e-3
    # a non-paper row against the reparsed baseline carries sane deltas
    alt = csv_line("mod16", 16, [16, 16, 16, 16], 112392, 1.0, 20.0, base)
    d = alt.split(",")
    assert abs(float(d[8]) - 10.62) < 0.05     # size delta %
    assert float(d[9]) > 0                      # slower than paper


def test_seed_chain_replay():
    """The LCG chain mutates once per executed (label, k) iteration with
    presets in order (end_to_end.rs:247-248)."""
    seed = 1337
    M, A, U = 1103515245, 12345, (1 << 64) - 1
    expect = {}
    for label, schedule in PRESETS:
        for k in ks_for_schedule(schedule):
            seed = (seed * M + A) & U
            expect[(label, k)] = seed
    assert witness_seed_for("paper", 11) == expect[("paper", 11)]
    assert witness_seed_for("paper", 16) == expect[("paper", 16)]
    assert witness_seed_for("uni128", 11) == expect[("uni128", 11)]
    assert witness_seed_for("hi128_32_8", 19) == expect[("hi128_32_8", 19)]
