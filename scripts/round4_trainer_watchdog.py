"""Trainer wedge watchdog (round 4).

The axon tunnel intermittently wedges a trainer (sleeping on a futex with no
log output — three occurrences today: 07:41 mid-epoch, 09:43 at backend
init). The queue's `timeout` only reaps after MAXS+900 s, burning up to an
hour per wedge. This watchdog detects a wedge in STALL_S seconds and kills
the EXACT pid so the queue's probe-gated retry takes over immediately.

Safety: never kills by pattern. A pid is killed only when ALL hold:
  * /proc/<pid>/cmdline contains `equidock_public_tpu.cli.train` AND a
    `-checkpoint_dir ./checkpts_r4/<name>` owned by this repo's queue;
  * its queue log results/round4_queue/<name>.log exists and has not been
    modified for STALL_S seconds;
  * the process has consumed < CPU_ACTIVE_S of CPU in that window (a busy
    compile keeps accruing CPU; a wedge sits on a futex).
Logs every decision to results/round4_queue/queue.log.
"""

import os
import time

Q = "results/round4_queue"
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
        if ("equidock_public_tpu.cli.train" not in " ".join(cmd)):
            continue
        name = None
        for i, a in enumerate(cmd):
            if a == "-checkpoint_dir" and i + 1 < len(cmd):
                ck = cmd[i + 1]
                if ck.startswith("./checkpts_r4/"):
                    name = ck.split("/")[-1]
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
    log(f"watchdog up (stall={STALL_S}s)")
    cpu_hist = {}
    while True:
        time.sleep(POLL_S)
        for pid, name in trainer_pids():
            logf = f"{Q}/{name}.log"
            if not os.path.exists(logf):
                continue
            age = time.time() - os.path.getmtime(logf)
            # startup wedge: backend init hangs BEFORE the banner prints
            # (observed 09:43, 10:01) — reap faster than a mid-run stall
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
                # first sight: just record — never kill before a real
                # observation window exists
                cpu_hist[pid] = (time.time(), cpu)
                continue
            prev_t, prev_cpu = cpu_hist[pid]
            if age < stall:
                cpu_hist[pid] = (time.time(), cpu)
                continue
            # log stale >= STALL_S: wedge unless it's genuinely computing
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
