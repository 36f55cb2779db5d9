"""Monitor CLI classification/verify/missing + pod-runner fan-out."""

import json
import os
import sys
import time

import pytest

from tokenize_audio_tpu.hub import LocalHub
from tokenize_audio_tpu.runner.monitor import (
    missing_report,
    scan_progress_dir,
    shard_status,
    verify_against_hub,
)
from tokenize_audio_tpu.runner.pod_runner import main as pod_main
from tokenize_audio_tpu.runner.progress import ShardProgress


def test_shard_status_taxonomy():
    assert shard_status({"completed": [], "failed": []}, 10)["status"] == "not_started"
    s = shard_status({"completed": ["a"], "failed": []}, 4)
    assert s["status"] == "in_progress (1/4, 25.0%)"
    assert shard_status({"completed": list("abcd"), "failed": []}, 4)["status"] == "completed"


def test_scan_verify_missing(tmp_path):
    prog_dir = str(tmp_path / "prog")
    p = ShardProgress(prog_dir, "en000")
    p.mark_completed("00000000")
    p.mark_completed("00000001")
    p.mark_failed("00000002")

    rows = scan_progress_dir(prog_dir, {"en000": 3})
    assert rows[0]["shard_id"] == "en000"
    assert rows[0]["completed"] == 2 and rows[0]["failed"] == 1

    hub = LocalHub(str(tmp_path / "hub"))
    src = tmp_path / "f.json"
    src.write_text("{}")
    hub.upload_file(str(src), "data/en000/00000000.json")
    problems = verify_against_hub(prog_dir, hub, "data/{shard}/{unit}.json")
    assert [pr["unit"] for pr in problems] == ["00000001"]

    missing = missing_report(
        {"en000": ["00000000", "00000005"]}, hub, "data/{shard}/{unit}.json"
    )
    assert missing == {"en000": ["00000005"]}


def test_monitor_cli_status_and_list_incomplete(tmp_path, capsys):
    from tokenize_audio_tpu.runner.monitor import main as mon_main

    prog_dir = str(tmp_path / "prog")
    ShardProgress(prog_dir, "s1").mark_completed("u0")
    ShardProgress(prog_dir, "s2").save()
    exp = tmp_path / "exp.json"
    exp.write_text(json.dumps({"s1": 1, "s2": 5}))
    inc = str(tmp_path / "inc.txt")
    mon_main(
        ["status", "--progress-dir", prog_dir, "--expected", str(exp), "--list-incomplete", inc]
    )
    out = capsys.readouterr().out
    assert "1/2 shards completed" in out
    assert open(inc).read().strip() == "s2"


def test_pod_runner_fanout_and_skip(tmp_path):
    shard_list = tmp_path / "shards.txt"
    shard_list.write_text("s1\ns2\ns3\n")
    run_dir = str(tmp_path / "run")
    log_dir = str(tmp_path / "logs")
    prog_dir = str(tmp_path / "prog")
    # mark s2 completed via meta.done
    p = ShardProgress(prog_dir, "s2")
    p.meta["done"] = True
    p.save()

    marker_dir = tmp_path / "markers"
    marker_dir.mkdir()
    rc = pod_main(
        [
            "run",
            "--shard-list",
            str(shard_list),
            "--max-concurrent",
            "2",
            "--poll-seconds",
            "0.1",
            "--run-dir",
            run_dir,
            "--log-dir",
            log_dir,
            "--progress-dir",
            prog_dir,
            "--wait",
            "--",
            sys.executable,
            "-c",
            f"open(r'{marker_dir}'+'/{{shard}}.done','w').write('ok'); print('ran {{shard}}')",
        ]
    )
    assert rc == 0
    assert sorted(os.listdir(marker_dir)) == ["s1.done", "s3.done"]  # s2 skipped
    assert "ran s1" in open(os.path.join(log_dir, "s1.log")).read()
    # pidfile cleaned up as jobs exit
    assert json.load(open(os.path.join(run_dir, "jobs.json"))) == {}


def test_pod_runner_adopted_jobs_count_toward_throttle(tmp_path):
    """A still-alive job adopted from the pidfile registry occupies a
    concurrency slot: a rerun with max-concurrent=1 must wait for it to
    exit before launching the next shard (it could otherwise oversubscribe
    the chip)."""
    import subprocess
    import time as _time

    from tokenize_audio_tpu.runner.pod_runner import _save_jobs

    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    # a previously-launched shard, still running for ~1.2 s. Reap it from
    # a thread the moment it exits: as OUR child it would otherwise linger
    # as a zombie that os.kill(pid, 0) still sees as alive (production
    # adopted pids are not the pod-runner's children, so this is test-only)
    import threading

    adopted = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(1.2)"])
    threading.Thread(target=adopted.wait, daemon=True).start()
    _save_jobs(run_dir, {"s_old": adopted.pid})

    shard_list = tmp_path / "shards.txt"
    shard_list.write_text("s_new\n")
    marker = tmp_path / "marker"
    t0 = _time.perf_counter()
    rc = pod_main(
        [
            "run",
            "--shard-list", str(shard_list),
            "--max-concurrent", "1",
            "--poll-seconds", "0.1",
            "--run-dir", run_dir,
            "--log-dir", str(tmp_path / "logs"),
            "--wait",
            "--",
            sys.executable, "-c", f"open(r'{marker}','w').write('{{shard}}')",
        ]
    )
    wall = _time.perf_counter() - t0
    adopted.wait()
    assert rc == 0
    assert marker.read_text() == "s_new"  # did launch, but only after...
    assert wall >= 1.0, f"launched while the adopted job still held the slot ({wall:.2f}s)"


def test_manifest_generation(tmp_path):
    from tokenize_audio_tpu.runner.manifests import (
        shard_list_from_hub,
        unit_counts_from_hub,
        write_shard_list,
    )

    hub = LocalHub(str(tmp_path / "hub2"))
    f = tmp_path / "x.json"
    f.write_text("{}")
    for shard, n in (("en000", 3), ("en001", 1)):
        for i in range(n):
            hub.upload_file(str(f), f"data/{shard}/{i:08d}.json")
    shards = shard_list_from_hub(hub, "data/")
    assert shards == ["en000", "en001"]
    counts = unit_counts_from_hub(hub, "data/")
    assert counts == {"en000": 3, "en001": 1}
    out = str(tmp_path / "list.txt")
    write_shard_list(shards, out)
    assert open(out).read() == "en000\nen001\n"


def test_monitor_live_workdir(tmp_path, capsys):
    from tokenize_audio_tpu.runner.monitor import live_workdir_report, main as mon_main

    work = tmp_path / "work" / "en000"
    work.mkdir(parents=True)
    (work / "00000001.out.json").write_text(
        json.dumps([{"audio_id": "a", "codes": {"c": [[1]]}}, {"audio_id": "b"}])
    )
    rep = live_workdir_report(str(tmp_path / "work"))
    assert rep == [
        {
            "file": "en000/00000001.out.json",
            "entries": 2,
            "encoded": 1,
            "complete": False,
        }
    ]
    assert mon_main(["live", "--work-dir", str(tmp_path / "work")]) == 0
    assert '"encoded": 1' in capsys.readouterr().out


def test_pod_runner_single_chip_warning(tmp_path, capsys, monkeypatch):
    """--max-concurrent above the visible chip count warns about contention
    (one TPU process per chip; CLAUDE-rule formalized as a runtime check)."""
    import argparse

    from tokenize_audio_tpu.runner import pod_runner

    monkeypatch.setenv("TOKENIZE_AUDIO_TPU_DEVICES", "1")
    lst = tmp_path / "shards.txt"
    lst.write_text("")  # no shards: run() returns after the guard
    args = argparse.Namespace(
        shard_list=str(lst),
        log_dir=str(tmp_path / "logs"),
        run_dir=str(tmp_path / "run"),
        progress_dir=None,
        max_concurrent=4,
        poll_seconds=0.01,
        cmd=["true"],
        wait=False,
        chips=None,
        chip_env=list(pod_runner.DEFAULT_CHIP_ENV),
        walltime=None,
        kill_grace=30.0,
    )
    pod_runner.run(args)
    assert "contend for the same chip" in capsys.readouterr().out


def test_pod_runner_status(tmp_path, capsys):
    import subprocess
    import threading

    from tokenize_audio_tpu.runner.pod_runner import _save_jobs

    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    live = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(5)"])
    threading.Thread(target=live.wait, daemon=True).start()
    _save_jobs(
        run_dir,
        {"s1": {"pid": live.pid, "chip": 2}, "s2": 99999999},  # v2 + v1 entries
    )
    assert pod_main(["status", "--run-dir", run_dir]) == 0
    out = capsys.readouterr().out
    assert f"s1\tpid={live.pid}\tchip=2\tage=0s\trunning" in out
    assert "s2\tpid=99999999\tchip=-\tage=0s\tdead" in out
    live.kill()


def test_pod_runner_unknown_chip_adoptee_blocks_isolated_launches(tmp_path, monkeypatch):
    """An adopted job with an UNKNOWN chip (v1 registry / pre-isolation
    launch) was started with no TPU_VISIBLE_DEVICES restriction — it holds
    every chip — so isolated launches must wait for it, not grab 'free'
    chips it is actually using."""
    import subprocess
    import threading
    import time as _time

    from tokenize_audio_tpu.runner.pod_runner import _save_jobs

    monkeypatch.setenv("TOKENIZE_AUDIO_TPU_DEVICES", "2")
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    adopted = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(1.2)"])
    threading.Thread(target=adopted.wait, daemon=True).start()
    _save_jobs(run_dir, {"s_old": adopted.pid})  # v1 bare-pid: chip unknown

    shard_list = tmp_path / "shards.txt"
    shard_list.write_text("s_new\n")
    marker = tmp_path / "marker"
    t0 = _time.perf_counter()
    rc = pod_main(
        [
            "run",
            "--shard-list", str(shard_list),
            "--max-concurrent", "2",  # a slot IS free — but no known chip
            "--poll-seconds", "0.1",
            "--run-dir", run_dir,
            "--log-dir", str(tmp_path / "logs"),
            "--wait",
            "--",
            sys.executable, "-c",
            f"import os; open(r'{marker}','w').write(os.environ['TPU_VISIBLE_DEVICES'])",
        ]
    )
    wall = _time.perf_counter() - t0
    adopted.wait()
    assert rc == 0
    assert marker.read_text() in {"0", "1"}
    assert wall >= 1.0, f"launched while an all-chip adoptee was alive ({wall:.2f}s)"


def test_pod_runner_per_chip_isolation(tmp_path, monkeypatch):
    """On a multi-chip host every concurrent job gets an EXCLUSIVE chip via
    env (the reference's one-GPU-per-job Slurm isolation,
    yodas2-mimi/submit/job_template.sh:3-15), the throttle caps at the chip
    count, and chips are reused once freed."""
    monkeypatch.setenv("TOKENIZE_AUDIO_TPU_DEVICES", "2")
    shard_list = tmp_path / "shards.txt"
    shard_list.write_text("s1\ns2\ns3\n")
    marker_dir = tmp_path / "markers"
    marker_dir.mkdir()
    code = (
        "import os, time; "
        f"open(r'{marker_dir}'+'/{{shard}}.chip','w').write("
        "os.environ['TPU_VISIBLE_DEVICES']); "
        "assert os.environ['TPU_PROCESS_BOUNDS'] == '1,1,1'; "
        "time.sleep(0.5)"
    )
    rc = pod_main(
        [
            "run",
            "--shard-list", str(shard_list),
            "--max-concurrent", "4",  # must cap to the 2 chips
            "--poll-seconds", "0.05",
            "--run-dir", str(tmp_path / "run"),
            "--log-dir", str(tmp_path / "logs"),
            "--wait",
            "--",
            sys.executable, "-c", code,
        ]
    )
    assert rc == 0
    chips = {s: (marker_dir / f"{s}.chip").read_text() for s in ("s1", "s2", "s3")}
    # first two run concurrently (cap 2) on disjoint chips; the third
    # reuses whichever chip freed first
    assert {chips["s1"], chips["s2"]} == {"0", "1"}
    assert chips["s3"] in {"0", "1"}


def test_pod_runner_walltime_kills_hung_job(tmp_path):
    """A job exceeding --walltime is SIGTERMed so its slot/chip frees and
    the queue keeps draining (the reference's Slurm walltime,
    yodas2-mimi/submit/job_template.sh:5). The hung child here would sleep
    for minutes; the well-behaved one must still get to run."""
    shard_list = tmp_path / "shards.txt"
    shard_list.write_text("hung\nquick\n")
    marker_dir = tmp_path / "markers"
    marker_dir.mkdir()
    code = (
        "import time, sys; "
        f"open(r'{marker_dir}'+'/{{shard}}.start','w').write('x'); "
        "time.sleep(120 if '{shard}' == 'hung' else 0); "
        f"open(r'{marker_dir}'+'/{{shard}}.done','w').write('x')"
    )
    t0 = time.perf_counter()
    rc = pod_main(
        [
            "run",
            "--shard-list", str(shard_list),
            "--max-concurrent", "1",  # hung job must free the only slot
            "--poll-seconds", "0.05",
            # the walltime clock starts at launch, so the budget must clear
            # child startup; -S below skips sitecustomize (which imports
            # jax and costs ~5 s in this environment — measured crossing a
            # 5 s budget on a cold run, SIGTERMing the child pre-marker)
            "--walltime", "5.0",
            "--kill-grace", "5.0",
            "--run-dir", str(tmp_path / "run"),
            "--log-dir", str(tmp_path / "logs"),
            "--wait",
            "--",
            sys.executable, "-S", "-c", code,
        ]
    )
    wall = time.perf_counter() - t0
    assert rc == 0
    assert (marker_dir / "hung.start").exists()
    assert not (marker_dir / "hung.done").exists()  # killed mid-sleep
    assert (marker_dir / "quick.done").exists()  # slot freed, queue drained
    assert wall < 60, f"walltime enforcement too slow ({wall:.1f}s)"
    # registry drained as both jobs exited
    assert json.load(open(tmp_path / "run" / "jobs.json")) == {}


def test_pod_runner_walltime_sigkill_escalation(tmp_path, capsys):
    """A job that ignores SIGTERM is SIGKILLed after --kill-grace."""
    shard_list = tmp_path / "shards.txt"
    shard_list.write_text("stubborn\n")
    marker = tmp_path / "armed"
    # -S skips the ~5 s sitecustomize/jax import, so the handler installs
    # milliseconds after launch — well inside the 3 s budget (else the
    # TERM kills the bare child outright and the escalation branch this
    # test exists to cover never runs)
    code = (
        "import signal, time; "
        "signal.signal(signal.SIGTERM, signal.SIG_IGN); "
        f"open(r'{marker}','w').write('x'); "
        "time.sleep(120)"
    )
    t0 = time.perf_counter()
    rc = pod_main(
        [
            "run",
            "--shard-list", str(shard_list),
            "--max-concurrent", "1",
            "--poll-seconds", "0.05",
            "--walltime", "3.0",
            "--kill-grace", "1.0",
            "--run-dir", str(tmp_path / "run"),
            "--log-dir", str(tmp_path / "logs"),
            "--wait",
            "--",
            sys.executable, "-S", "-c", code,
        ]
    )
    wall = time.perf_counter() - t0
    assert rc == 0
    assert wall < 60, f"SIGKILL escalation too slow ({wall:.1f}s)"
    assert marker.exists(), "child never armed its SIGTERM handler"
    # the escalation branch must actually have fired — without this the
    # test can pass vacuously when the TERM kills a slow-starting child
    assert "sending SIGKILL" in capsys.readouterr().out
    assert json.load(open(tmp_path / "run" / "jobs.json")) == {}


def test_chip_check_single_device_contract(monkeypatch):
    """chip_check spawns a child under the pod runner's injected chip env
    and passes iff the child enumerates exactly ONE device and computes.
    Simulated on CPU: a 1-virtual-device child passes, an 8-device child
    fails with the --chip-env guidance."""
    from tokenize_audio_tpu.runner.chip_check import check_chip

    ok = check_chip(
        chip=0,
        templates=("XLA_FLAGS=--xla_force_host_platform_device_count=1",),
        force_platform="cpu",
        timeout=120,
    )
    assert ok["ok"] and ok["child"]["n_devices"] == 1 and ok["child"]["compute_ok"]

    bad = check_chip(
        chip=0,
        templates=("XLA_FLAGS=--xla_force_host_platform_device_count=8",),
        force_platform="cpu",
        timeout=120,
    )
    assert not bad["ok"] and bad["child"]["n_devices"] == 8
    assert "--chip-env" in bad["error"]


def test_chip_check_cli_exit_codes(capsys):
    """The CLI prints one JSON line and exits 0/1 on pass/fail."""
    import json as _json

    from tokenize_audio_tpu.runner import chip_check

    old = dict(os.environ)
    os.environ["TOKENIZE_AUDIO_CHIP_CHECK_PLATFORM"] = "cpu"
    try:
        rc = chip_check.main(
            ["--chip-env", "XLA_FLAGS=--xla_force_host_platform_device_count=1",
             "--timeout", "120"]
        )
    finally:
        os.environ.clear()
        os.environ.update(old)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0 and len(out) == 1
    rep = _json.loads(out[0])
    assert rep["ok"] and rep["injected_env"]["XLA_FLAGS"]
