"""bench.py emission contract (VERDICT r8 #1): the driver's BENCH record
keeps only the LAST 2000 characters of stdout, so the final line must
(a) fit that budget WITH every per-query time recoverable, and (b) mirror
the complete named map into BENCH_FULL_LAST.json for the end-of-round
commit. Pinned against a synthetic registry the size of the real one with
adversarially long names."""
import hashlib
import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _times(n=220):
    # worst case: more queries than the real registry, 30-char names,
    # spread of magnitudes so the slowest-named subset is non-trivial
    return {
        f"query_with_a_very_long_name_{i:03d}": round(0.11 + (i % 37) * 0.37, 3)
        for i in range(n)
    }


def test_line_fits_tail_budget_and_parses(tmp_path):
    bench = _bench()
    times = _times()
    line = bench.emit(times, 0.1, 210.0, 1.12, 0.71, out_dir=str(tmp_path))
    assert len(line) <= 2000 - 50  # whole line survives the tail capture
    d = json.loads(line)
    # every per-query time present, execution order, name-order pinned
    assert len(d["qt"]) == len(times)
    assert d["qt"] == [round(t, 2) for t in times.values()]
    assert d["qt_names_sha8"] == hashlib.sha256(
        "\n".join(times).encode()
    ).hexdigest()[:8]
    # named subset is the slowest entries
    assert d["queries"]
    named_min = min(d["queries"].values())
    unnamed_max = max(t for n, t in times.items() if n not in d["queries"])
    assert named_min >= unnamed_max
    # scalars at the very end of the line (tail-capture insurance)
    assert line.rstrip().endswith(f'"value":{d["value"]}}}')
    assert d["value"] == round(sum(times.values()), 3)
    assert d["value_normalized"] == round(d["value"] * 1.17 / 1.12, 3)


def test_full_file_has_every_query(tmp_path):
    bench = _bench()
    times = _times()
    times["broken_query"] = float("inf")
    line = bench.emit(times, 0.1, 210.0, 1.12, None, out_dir=str(tmp_path))
    full = json.load(open(os.path.join(str(tmp_path), "BENCH_FULL_LAST.json")))
    assert set(full["queries"]) == set(times)
    assert full["queries"]["broken_query"] is None  # inf -> null, valid JSON
    assert full["failed"] == ["broken_query"]
    assert full["value"] == round(
        sum(t for t in times.values() if t != float("inf")), 3
    )
    d = json.loads(line)  # inf never reaches the stdout line either
    assert d["failed"] == ["broken_query"]
    assert None in d["qt"] and "Infinity" not in line


def test_host_mode_brackets_in_line_and_timeline_in_full_file(tmp_path):
    """r10: the suite is bracketed by BOTH probes (BENCH_r09's healthy
    end-of-run eff 1.085 sat on a uniformly ~1.46x-inflated run — one
    post-suite sample can't see a collapse that ends with the suite), and
    the mid-run single-thread samples land in the full file only (the
    stdout line must stay under the driver's tail capture)."""
    bench = _bench()
    times = _times()
    line = bench.emit(
        times, 0.1, 210.0, 1.12, 0.71, out_dir=str(tmp_path),
        par_eff_pre=0.93, probe_timeline=[[50, 1.21], [100, 3.9], [150, 1.3]],
    )
    assert len(line) <= 2000 - 50
    d = json.loads(line)
    assert d["host_parallel_eff_pre"] == 0.93
    assert d["host_parallel_eff"] == 0.71
    assert "host_probe_timeline" not in d  # line stays lean
    full = json.load(open(os.path.join(str(tmp_path), "BENCH_FULL_LAST.json")))
    assert full["host_probe_timeline"] == [[50, 1.21], [100, 3.9], [150, 1.3]]
    assert full["host_parallel_eff_pre"] == 0.93
    # probes omitted entirely (pool failure) serialize as null, not NaN
    d2 = json.loads(bench.emit(times, 0.1, 210.0, 1.12, None, out_dir=str(tmp_path)))
    assert d2["host_parallel_eff_pre"] is None


def test_small_run_keeps_all_names(tmp_path):
    bench = _bench()
    times = {"a": 1.0, "b": 2.0}
    d = json.loads(bench.emit(times, 0.01, 3.0, 1.17, 0.9, out_dir=str(tmp_path)))
    assert d["queries"] == {"a": 1.0, "b": 2.0}


def test_triage_reconstructs_from_qt(tmp_path):
    """The qt array + the live registry reproduce the full named map the
    way scripts/bench_triage.py does it."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    sha8 = hashlib.sha256("\n".join(names).encode()).hexdigest()[:8]
    bench = _bench()
    times = {n: 0.5 for n in names}
    d = json.loads(bench.emit(times, 0.1, 99.0, 1.1, 0.8, out_dir=str(tmp_path)))
    assert d["qt_names_sha8"] == sha8
    assert dict(zip(names, d["qt"])) == {n: 0.5 for n in names}
