"""Janitor (scripts/kill_stale_tpu.py): fd-evidence discovery over a fake
/proc tree, self/ancestor protection, min-age filter, term->kill escalation.
No real process is ever signalled."""
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from kill_stale_tpu import find_stale, terminate  # noqa: E402


def _mk_proc(tmp_path, pid, ppid, fd_targets, cmd="python train.py",
             age_s=0.0):
    d = tmp_path / str(pid)
    (d / "fd").mkdir(parents=True)
    (d / "stat").write_text(f"{pid} (python) S {ppid} 0 0")
    (d / "cmdline").write_bytes(cmd.replace(" ", "\x00").encode() + b"\x00")
    for i, target in enumerate(fd_targets):
        # symlink targets need not exist — readlink still returns them
        os.symlink(target, d / "fd" / str(i))
    past = time.time() - age_s
    os.utime(d, (past, past))


def test_find_stale_fd_evidence_and_protection(tmp_path):
    _mk_proc(tmp_path, 1, 0, [])
    _mk_proc(tmp_path, 100, 1, ["/dev/accel0"], "python bench.py",
             age_s=500)
    _mk_proc(tmp_path, 101, 1, ["/tmp/libtpu_lockfile"], "python train.py",
             age_s=50)
    _mk_proc(tmp_path, 102, 1, ["/dev/null", "pipe:[123]"], "bash")
    _mk_proc(tmp_path, 200, 1, ["/dev/accel1"], "the janitor's parent",
             age_s=900)
    _mk_proc(tmp_path, 201, 200, ["/dev/accel1"], "the janitor itself")

    got = find_stale(proc=str(tmp_path), self_pid=201)
    assert [t["pid"] for t in got] == [100, 101]  # age-descending
    assert got[0]["cmd"] == "python bench.py"

    # min-age filters the young holder; exclude protects explicitly
    assert [t["pid"] for t in find_stale(proc=str(tmp_path), self_pid=201,
                                         min_age=100)] == [100]
    assert find_stale(proc=str(tmp_path), self_pid=201,
                      exclude={100, 101}) == []


def test_terminate_escalates(tmp_path):
    sent = []
    alive = {100: 3}  # survives 3 liveness polls after TERM

    def fake_kill(pid, sig):
        if sig == 0:
            if alive.get(pid, 0) > 0:
                alive[pid] -= 1
                return  # still alive
            raise ProcessLookupError
        sent.append((pid, sig))

    n = terminate([{"pid": 100}, {"pid": 999}], grace=5.0, kill_fn=fake_kill)
    assert n == 2
    assert (100, signal.SIGTERM) in sent and (999, signal.SIGTERM) in sent
    # 100 died within grace after polls -> no SIGKILL for anyone
    assert all(sig != signal.SIGKILL for _, sig in sent)

    sent.clear()
    alive[100] = 10 ** 9  # never dies

    def fake_kill2(pid, sig):
        if sig == 0:
            return  # alive forever
        sent.append((pid, sig))

    terminate([{"pid": 100}], grace=0.3, kill_fn=fake_kill2)
    assert (100, signal.SIGKILL) in sent


def test_cli_dry_run_never_kills(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "kill_stale_tpu.py"),
         "--min_age", "31536000"],  # a year: nothing qualifies
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0
    assert "no TPU-holding processes" in r.stdout or "dry-run" in r.stdout
