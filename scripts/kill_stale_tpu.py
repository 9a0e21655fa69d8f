#!/usr/bin/env python
"""Stale-TPU-process janitor for pod hosts (reference
``scripts/scripts/kill_zombies.sh`` analog, redesigned to be safe).

The reference greps `ps` for user-supplied keywords and `kill -9`s every
match — which happily kills innocent processes (its own --help warns so).
This janitor instead identifies processes by EVIDENCE of holding the TPU:
an open file descriptor on a TPU device node (``/dev/accel*``, ``/dev/vfio``)
or the libtpu lockfile (``/tmp/libtpu_lockfile``). A wedged trainer that
died without releasing the chip is exactly such a process; nothing else is.

Safety properties:
- dry-run by default (prints the would-be targets); ``--kill`` to act;
- never targets itself, its ancestors, or PIDs in ``--exclude``;
- optional ``--min_age`` (seconds since process start) so a live run that
  just grabbed the chip isn't considered stale;
- SIGTERM first, SIGKILL only after ``--grace`` seconds if still alive.

Usage (on a pod worker, typically via the pod launcher):
    python scripts/kill_stale_tpu.py                 # list holders
    python scripts/kill_stale_tpu.py --kill --min_age 600
"""
from __future__ import annotations

import argparse
import os
import signal
import time

TPU_FD_MARKERS = ("/dev/accel", "/dev/vfio", "libtpu_lockfile")


def _ancestors(pid: int, proc: str) -> set[int]:
    out = set()
    while pid > 1:
        out.add(pid)
        try:
            with open(f"{proc}/{pid}/stat") as fp:
                # field 4 is ppid; comm (field 2) may contain spaces but is
                # parenthesised — split after the closing paren
                stat = fp.read()
            pid = int(stat.rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            break
    out.add(1)
    return out


def _holds_tpu(pid: int, proc: str) -> bool:
    fd_dir = f"{proc}/{pid}/fd"
    try:
        fds = os.listdir(fd_dir)
    except OSError:
        return False
    for fd in fds:
        try:
            target = os.readlink(os.path.join(fd_dir, fd))
        except OSError:
            continue
        if any(m in target for m in TPU_FD_MARKERS):
            return True
    return False


def _age_s(pid: int, proc: str) -> float:
    try:
        return time.time() - os.stat(f"{proc}/{pid}").st_mtime
    except OSError:
        return 0.0


def _cmdline(pid: int, proc: str) -> str:
    try:
        with open(f"{proc}/{pid}/cmdline", "rb") as fp:
            return fp.read().replace(b"\x00", b" ").decode().strip()
    except OSError:
        return "?"


def find_stale(proc: str = "/proc", min_age: float = 0.0,
               exclude: set[int] | None = None,
               self_pid: int | None = None) -> list[dict]:
    """All TPU-holding PIDs older than ``min_age``, minus self+ancestors."""
    self_pid = os.getpid() if self_pid is None else self_pid
    skip = _ancestors(self_pid, proc) | (exclude or set())
    found = []
    for entry in os.listdir(proc):
        if not entry.isdigit():
            continue
        pid = int(entry)
        if pid in skip or not _holds_tpu(pid, proc):
            continue
        age = _age_s(pid, proc)
        if age < min_age:
            continue
        found.append({"pid": pid, "age_s": round(age, 1),
                      "cmd": _cmdline(pid, proc)})
    return sorted(found, key=lambda d: -d["age_s"])


def terminate(targets: list[dict], grace: float = 10.0,
              kill_fn=os.kill) -> int:
    n = 0
    for t in targets:
        try:
            kill_fn(t["pid"], signal.SIGTERM)
            n += 1
        except ProcessLookupError:
            continue
        except PermissionError:
            print(f"[janitor] no permission for pid {t['pid']}")
            continue
    deadline = time.time() + grace
    for t in targets:
        while time.time() < deadline:
            try:
                kill_fn(t["pid"], 0)
            except (ProcessLookupError, PermissionError):
                break
            time.sleep(0.2)
        else:
            try:
                kill_fn(t["pid"], signal.SIGKILL)
                print(f"[janitor] SIGKILL {t['pid']} (survived grace)")
            except (ProcessLookupError, PermissionError):
                pass
    return n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kill", action="store_true",
                    help="actually terminate (default: dry-run listing)")
    ap.add_argument("--min_age", type=float, default=0.0,
                    help="only processes older than this many seconds")
    ap.add_argument("--grace", type=float, default=10.0,
                    help="seconds between SIGTERM and SIGKILL")
    ap.add_argument("--exclude", type=int, nargs="*", default=[],
                    help="additional PIDs to protect")
    args = ap.parse_args()

    targets = find_stale(min_age=args.min_age, exclude=set(args.exclude))
    if not targets:
        print("[janitor] no TPU-holding processes found")
        return
    for t in targets:
        print(f"[janitor] pid {t['pid']:>7}  age {t['age_s']:>8.1f}s  "
              f"{t['cmd'][:120]}")
    if not args.kill:
        print(f"[janitor] dry-run: {len(targets)} holder(s); "
              "pass --kill to terminate")
        return
    n = terminate(targets, grace=args.grace)
    print(f"[janitor] terminated {n}/{len(targets)}")


if __name__ == "__main__":
    main()
