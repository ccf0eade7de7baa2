"""bench.py robustness contract (VERDICT r2 item 1): the driver must ALWAYS
capture one parseable JSON line, even when the TPU tunnel is wedged or the
driver's timeout kills the process mid-run.

These tests run bench.py as a subprocess with the wedged path injected
(BENCH_FORCE_WEDGED) so no TPU/tunnel access ever happens.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BENCH = REPO / "bench.py"


def _env(tmp_path, **extra):
    env = dict(os.environ)
    env.pop("BENCH_TEST_HANG", None)
    env["BENCH_FORCE_WEDGED"] = "1"
    # run from a scratch cwd; cache path is anchored to the repo, so tests
    # that need cache isolation copy bench.py instead
    env.update(extra)
    return env


def _bench_copy(tmp_path):
    """Copy bench.py to a tmp dir so BENCH_LOCAL.json resolves there."""
    dst = tmp_path / "bench.py"
    dst.write_text(BENCH.read_text())
    return dst


def _last_json_line(stdout: str) -> dict:
    lines = [l for l in stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in output: {stdout!r}"
    return json.loads(lines[-1])


def test_wedged_no_cache_still_emits(tmp_path):
    bench = _bench_copy(tmp_path)
    r = subprocess.run([sys.executable, str(bench)], env=_env(tmp_path),
                       capture_output=True, text=True, timeout=120)
    out = _last_json_line(r.stdout)
    assert out["unit"] == "s/step"
    assert out["detail"].get("error")  # no cache, no chip → explicit marker
    assert "value" in out and "vs_baseline" in out


def test_wedged_emits_cache_marked_stale(tmp_path):
    bench = _bench_copy(tmp_path)
    cache = {
        "value": 4.2, "vs_baseline": 0.77,
        "detail": {"seq_len": 32760, "dit_720p_step_s": 17.0},
        "measured_at": "2026-08-17T00:00:00Z",
    }
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(cache))
    r = subprocess.run([sys.executable, str(bench)], env=_env(tmp_path),
                       capture_output=True, text=True, timeout=120)
    out = _last_json_line(r.stdout)
    assert out["value"] == 4.2
    assert out["vs_baseline"] == 0.77
    assert out["detail"]["stale"] is True
    assert out["detail"]["stale_measured_at"] == "2026-08-17T00:00:00Z"
    assert out["detail"]["dit_720p_step_s"] == 17.0


def test_sigterm_mid_run_emits_before_dying(tmp_path):
    bench = _bench_copy(tmp_path)
    cache = {"value": 4.3, "vs_baseline": 0.75, "detail": {},
             "measured_at": "2026-08-17T00:00:00Z"}
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(cache))
    p = subprocess.Popen(
        [sys.executable, str(bench)],
        env=_env(tmp_path, BENCH_TEST_HANG="1"),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    # wait for the handlers-installed marker (slow interpreter start on a
    # 1-core box makes a fixed sleep racy)
    line = ""
    deadline = time.monotonic() + 60
    while "handlers installed" not in line:
        assert time.monotonic() < deadline, "bench never reached the hang hook"
        line = p.stderr.readline()
    p.send_signal(signal.SIGTERM)
    stdout, _ = p.communicate(timeout=60)
    out = _last_json_line(stdout)
    assert out["value"] == 4.3
    assert out["detail"]["stale"] is True


def test_wedged_emission_is_fast(tmp_path):
    """The wedged path must emit well inside any plausible driver timeout
    (no 900 s waits — total tunnel budget is capped)."""
    bench = _bench_copy(tmp_path)
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps({"value": 1.0, "vs_baseline": 0.5, "detail": {}}))
    t0 = time.monotonic()
    r = subprocess.run([sys.executable, str(bench)], env=_env(tmp_path),
                       capture_output=True, text=True, timeout=120)
    assert time.monotonic() - t0 < 60
    assert _last_json_line(r.stdout)["detail"]["stale"] is True


def test_merge_phase_cache_noop_preserves_measured_at(tmp_path):
    """An empty merge (all phase logs missing) must not re-date the cache:
    measured_at is the staleness provenance the driver artifact cites."""
    import shutil

    tool = tmp_path / "tools" / "dev" / "merge_phase_cache.py"
    tool.parent.mkdir(parents=True)
    tool.write_text((REPO / "tools/dev/merge_phase_cache.py").read_text())
    cache = tmp_path / "BENCH_LOCAL.json"
    cache.write_text(json.dumps({
        "value": 4.0, "vs_baseline": 0.8, "detail": {"k": 1},
        "measured_at": "2026-01-01T00:00:00Z"}))
    before = cache.read_text()

    # no-op merge: missing log → untouched file
    subprocess.run([sys.executable, str(tool), str(tmp_path / "missing.log")],
                   check=True, capture_output=True, timeout=60)
    assert cache.read_text() == before

    # real merge: new key lands and measured_at refreshes
    log = tmp_path / "phase.log"
    log.write_text('PHASE_JSON:{"new_key": 2.5}\n')
    subprocess.run([sys.executable, str(tool), str(log)],
                   check=True, capture_output=True, timeout=60)
    merged = json.loads(cache.read_text())
    assert merged["detail"]["new_key"] == 2.5
    assert merged["measured_at"] != "2026-01-01T00:00:00Z"


def test_merged_stream_last_line_is_json(tmp_path):
    """VERDICT r4 item 2: the driver reads the MERGED-stream last line.
    Nothing — not even the final chip-health probe note — may print after
    the JSON result on either stream."""
    bench = _bench_copy(tmp_path)
    # (a) the full-orchestration tail (BENCH_TEST_CONTRACT skips chip work
    # but runs the real _finalize() ordering)
    env = _env(tmp_path, BENCH_TEST_CONTRACT="1")
    r = subprocess.run([sys.executable, str(bench)], env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=120)
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    out = json.loads(lines[-1])  # raises if anything trails the JSON
    assert out["unit"] == "s/step"
    assert out["detail"]["contract_test"] is True
    # (b) the wedged path
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps({"value": 2.0, "vs_baseline": 0.6, "detail": {}}))
    r = subprocess.run([sys.executable, str(bench)], env=_env(tmp_path),
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=120)
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert json.loads(lines[-1])["detail"]["stale"] is True
