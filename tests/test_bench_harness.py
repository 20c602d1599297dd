"""bench.py orchestration: early headline, failure isolation, budget skip.

The bench is the round's deliverable artifact; its control flow (one stdout
JSON line, per-config failure isolation, wall-clock budget) is tested here
with the heavy per-config work stubbed out.
"""

import importlib
import json
import sys


def _load_bench():
    sys.modules.pop("bench", None)
    return importlib.import_module("bench")


def _run_main(monkeypatch, capsys, results, budget=None, tmp_path=None):
    """Run bench.main() with _bench_config stubbed to yield ``results``.

    ``results``: dict config-name -> detail dict or Exception.
    Returns (rc, stdout lines as parsed json, stderr text).
    """
    bench = _load_bench()
    if budget is not None:
        monkeypatch.setattr(bench, "BUDGET_S", budget)
    if tmp_path is not None:
        monkeypatch.setattr(
            bench.os.path, "dirname", lambda p: str(tmp_path), raising=False
        )

    def fake_config(name, **kw):
        r = results[name]
        if isinstance(r, Exception):
            raise r
        return dict(r)

    monkeypatch.setattr(bench, "_bench_config", fake_config)
    monkeypatch.setattr(bench, "_free_host_caches", lambda: None)
    monkeypatch.setattr("walt_tpu.hostmem.prefault", lambda *a, **k: True)
    rc = bench.main()
    cap = capsys.readouterr()
    out = [json.loads(line) for line in cap.out.splitlines() if line.strip()]
    return rc, out, cap.err


def _detail(name, value=1000.0, unit="reads/s"):
    return {"config": name, "value": value, "unit": unit,
            "vs_baseline": 1.0}


def test_headline_is_first_success_and_prints_early(monkeypatch, capsys,
                                                    tmp_path):
    results = {
        "se_large_512M": _detail("se_large_512M", 140000.0),
        "pe_mid_256M": _detail("pe_mid_256M", 50000.0, "pairs/s"),
        "se_small_4M": _detail("se_small_4M", 250000.0),
        "se_xl_768M": _detail("se_xl_768M", 110000.0),
    }
    rc, out, _ = _run_main(monkeypatch, capsys, results, tmp_path=tmp_path)
    assert rc == 0
    # the headline is re-printed after every config (kill-safety) and once
    # at the end -- every stdout JSON line must BE the headline, so the
    # driver's last-line parse always lands on it
    assert out and all(o == out[0] for o in out)
    assert out[-1]["metric"] == "se_large_512M_reads_per_s_1chip"
    assert out[-1]["value"] == 140000.0


def test_failed_headline_falls_through_to_next_config(monkeypatch, capsys,
                                                      tmp_path):
    results = {
        "se_large_512M": RuntimeError("RESOURCE_EXHAUSTED boom"),
        "pe_mid_256M": _detail("pe_mid_256M", 50000.0, "pairs/s"),
        "se_small_4M": _detail("se_small_4M", 250000.0),
        "se_xl_768M": _detail("se_xl_768M", 110000.0),
    }
    rc, out, err = _run_main(monkeypatch, capsys, results, tmp_path=tmp_path)
    assert rc == 0  # one config failing does not fail the bench
    assert out[-1]["metric"] == "pe_mid_256M_pairs_per_s_1chip"
    assert "FAILED" in err


def test_all_failed_reports_nonzero(monkeypatch, capsys, tmp_path):
    results = {k: RuntimeError("x") for k in
               ("se_large_512M", "pe_mid_256M", "se_small_4M", "se_xl_768M")}
    rc, out, _ = _run_main(monkeypatch, capsys, results, tmp_path=tmp_path)
    assert rc == 1
    assert out[-1]["metric"] == "bench_failed"


def test_budget_skips_remaining_configs(monkeypatch, capsys, tmp_path):
    bench = _load_bench()
    calls = []
    results = {
        "se_large_512M": _detail("se_large_512M", 140000.0),
        "pe_mid_256M": _detail("pe_mid_256M", 50000.0, "pairs/s"),
        "se_small_4M": _detail("se_small_4M"),
        "se_xl_768M": _detail("se_xl_768M"),
    }

    def fake_config(name, **kw):
        calls.append(name)
        return dict(results[name])

    monkeypatch.setattr(bench, "_bench_config", fake_config)
    monkeypatch.setattr(bench, "_free_host_caches", lambda: None)
    monkeypatch.setattr("walt_tpu.hostmem.prefault", lambda *a, **k: True)
    monkeypatch.setattr(bench, "BUDGET_S", -1.0)  # exceeded after config 1
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path), raising=False
    )
    rc = bench.main()
    cap = capsys.readouterr()
    assert rc == 0
    assert calls == ["se_large_512M"]  # later configs skipped
    assert "skipping" in cap.err
    out = [json.loads(line) for line in cap.out.splitlines() if line.strip()]
    assert out[-1]["metric"] == "se_large_512M_reads_per_s_1chip"


def test_detail_lines_are_not_parseable_json(monkeypatch, capsys, tmp_path):
    """Per-config detail must not be a bare JSON line anywhere: the round-3
    driver parsed the LAST JSON-looking line of merged output and recorded
    a detail dict instead of the headline (BENCH_r03.json)."""
    results = {
        "se_large_512M": _detail("se_large_512M", 140000.0),
        "pe_mid_256M": _detail("pe_mid_256M", 50000.0, "pairs/s"),
        "se_small_4M": _detail("se_small_4M", 250000.0),
        "se_xl_768M": _detail("se_xl_768M", 110000.0),
    }
    rc, out, err = _run_main(monkeypatch, capsys, results, tmp_path=tmp_path)
    assert rc == 0
    for line in err.splitlines():
        assert not line.lstrip().startswith("{")
    assert out[-1]["metric"] == "se_large_512M_reads_per_s_1chip"
