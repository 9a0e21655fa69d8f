"""Smoke tests for scripts/sync_artifacts.sh (the scripts/sync/ analog):
push/pull between local dirs (the rsync/cp path gs:// remotes share the
CLI surface with)."""
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "sync_artifacts.sh")


def _run(args, env=None):
    e = dict(os.environ)
    e.update(env or {})
    return subprocess.run(["bash", SCRIPT, *args], capture_output=True,
                          text=True, env=e, cwd=REPO)


def test_push_and_pull_ckpts(tmp_path):
    ckpts = tmp_path / "workdir" / "job1" / "500"
    ckpts.mkdir(parents=True)
    (ckpts / "state.orbax").write_text("weights")
    remote = tmp_path / "remote"

    r = _run(["push", "ckpts", "-j", "job1", "-s", "500",
              "-r", str(remote)],
             env={"CKPT_ROOT": str(tmp_path / "workdir")})
    assert r.returncode == 0, r.stderr
    assert (remote / "ckpts" / "job1" / "500" / "state.orbax").read_text() \
        == "weights"

    # pull back into a fresh local root
    local2 = tmp_path / "workdir2"
    r = _run(["pull", "ckpts", "-j", "job1", "-s", "500",
              "-r", str(remote)],
             env={"CKPT_ROOT": str(local2)})
    assert r.returncode == 0, r.stderr
    assert (local2 / "job1" / "500" / "state.orbax").read_text() == "weights"


def test_push_data_uses_sync_remote_env(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    (data / "annotation.pkl").write_bytes(b"x")
    remote = tmp_path / "store"
    r = _run(["push", "data"],
             env={"DATA_ROOT": str(data), "SYNC_REMOTE": str(remote)})
    assert r.returncode == 0, r.stderr
    assert (remote / "data" / "annotation.pkl").exists()


def test_missing_remote_fails_loudly(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "SYNC_REMOTE"}
    r = subprocess.run(["bash", SCRIPT, "push", "ckpts"],
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode != 0
    assert "no remote" in r.stderr


def test_bad_args_usage():
    r = _run(["frobnicate"])
    assert r.returncode != 0
