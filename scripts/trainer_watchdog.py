"""Trainer wedge watchdog (round-5 generalization of
scripts/round4_trainer_watchdog.py — see that file's docstring for the
failure mode and the safety rules). Parametrized by env:

    WD_QUEUE_DIR   queue dir holding <name>.log + queue.log
                   (default results/round5_queue)
    WD_CKPT_PREFIX -checkpoint_dir prefix that marks a trainer as ours
                   (default ./checkpts_r5/)

Never kills by pattern: the exact pid must be a `equidock_public_tpu.cli.train`
process whose -checkpoint_dir lives under WD_CKPT_PREFIX, its queue log must
be stale >= STALL_S (360 s pre-banner), and it must have burned < 60 s CPU in
the observation window (a compiling process keeps accruing CPU; a wedge sits
on a futex).
"""

import os
import time

Q = os.environ.get("WD_QUEUE_DIR", "results/round5_queue")
CKPT_PREFIX = os.environ.get("WD_CKPT_PREFIX", "./checkpts_r5/")
STALL_S = 720
POLL_S = 60
CPU_ACTIVE_S = 60


def log(msg):
    with open(f"{Q}/queue.log", "a") as f:
        f.write(f"[watchdog] {time.strftime('%H:%M:%S')} {msg}\n")


def trainer_pids():
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace").split("\0")
        except OSError:
            continue
        if "equidock_public_tpu.cli.train" not in " ".join(cmd):
            continue
        name = None
        for i, a in enumerate(cmd):
            if a == "-checkpoint_dir" and i + 1 < len(cmd):
                ck = cmd[i + 1]
                if ck.startswith(CKPT_PREFIX):
                    name = ck.rstrip("/").split("/")[-1]
        if name:
            out.append((int(pid), name))
    return out


def cpu_seconds(pid):
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split()
        return (int(parts[13]) + int(parts[14])) / os.sysconf("SC_CLK_TCK")
    except OSError:
        return None


def main():
    log(f"watchdog up (stall={STALL_S}s, prefix={CKPT_PREFIX})")
    cpu_hist = {}
    while True:
        time.sleep(POLL_S)
        for pid, name in trainer_pids():
            logf = f"{Q}/{name}.log"
            if not os.path.exists(logf):
                continue
            age = time.time() - os.path.getmtime(logf)
            try:
                with open(logf, errors="replace") as f:
                    started = "Model name" in f.read()
            except OSError:
                started = True
            stall = STALL_S if started else 360
            cpu = cpu_seconds(pid)
            if cpu is None:
                continue
            if pid not in cpu_hist:
                cpu_hist[pid] = (time.time(), cpu)
                continue
            prev_t, prev_cpu = cpu_hist[pid]
            if age < stall:
                cpu_hist[pid] = (time.time(), cpu)
                continue
            cpu_delta = cpu - prev_cpu
            if cpu_delta > CPU_ACTIVE_S:
                log(f"{name} pid {pid}: log stale {age:.0f}s but cpu "
                    f"+{cpu_delta:.0f}s — busy (compile?), not killing")
                cpu_hist[pid] = (time.time(), cpu)
                continue
            log(f"{name} pid {pid}: WEDGED (log stale {age:.0f}s, cpu "
                f"+{cpu_delta:.0f}s) — killing for queue retry")
            try:
                os.kill(pid, 15)
                time.sleep(10)
                os.kill(pid, 9)
            except OSError:
                pass
            cpu_hist.pop(pid, None)


if __name__ == "__main__":
    main()
