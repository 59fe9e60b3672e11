"""Dependency-free kernel-stack sampler (perf_event_open via ctypes).

Answers "where is all this system time going?" on hosts with no perf/strace
binaries (like this sandbox).  Samples PERF_COUNT_SW_CPU_CLOCK on every CPU
with PERF_SAMPLE_CALLCHAIN, keeps only kernel-address frames, symbolizes via
/proc/kallsyms, and prints the top aggregated 4-frame kernel stacks.

Requires root (or perf_event_paranoid <= 1).  x86_64 only (syscall nr 298).

Usage:  python tools/kprof.py [seconds=10] [top_n=25]

This is how the round-3 build-scaling ceiling was root-caused: at 32-way
concurrency ~92% of all CPU ticks sampled inside
``get_page_from_freelist <- alloc_anon_folio`` — kernel zone-lock contention
(amplified by hypervisor lock-holder preemption) on anonymous page faults
from per-batch allocator churn.  The fix is page retention + pre-warm, see
``search_engine_ray/state/memtune.py``.
"""

from __future__ import annotations

import bisect
import collections
import ctypes
import fcntl
import mmap
import os
import struct
import sys
import time

PERF_TYPE_SOFTWARE = 1
PERF_COUNT_SW_CPU_CLOCK = 0
PERF_SAMPLE_CALLCHAIN = 1 << 5
PERF_RECORD_SAMPLE = 9
SYS_perf_event_open = 298  # x86_64
PERF_EVENT_IOC_ENABLE = 0x2400
PERF_EVENT_IOC_DISABLE = 0x2401
RING_PAGES = 256  # 1 MiB data ring per CPU
KERNEL_LO, KERNEL_HI = 0xFFFFFFFF80000000, 0xFFFFFFFFFFF00000


class perf_event_attr(ctypes.Structure):
    _fields_ = [
        ("type", ctypes.c_uint32), ("size", ctypes.c_uint32),
        ("config", ctypes.c_uint64), ("sample_period", ctypes.c_uint64),
        ("sample_type", ctypes.c_uint64), ("read_format", ctypes.c_uint64),
        ("flags", ctypes.c_uint64),
        ("wakeup_events", ctypes.c_uint32), ("bp_type", ctypes.c_uint32),
        ("bp_addr", ctypes.c_uint64), ("bp_len", ctypes.c_uint64),
        ("branch_sample_type", ctypes.c_uint64),
        ("sample_regs_user", ctypes.c_uint64),
        ("sample_stack_user", ctypes.c_uint32), ("clockid", ctypes.c_int32),
        ("sample_regs_intr", ctypes.c_uint64),
        ("aux_watermark", ctypes.c_uint32),
        ("sample_max_stack", ctypes.c_uint16),
        ("__reserved_2", ctypes.c_uint16),
        ("aux_sample_size", ctypes.c_uint32),
        ("__reserved_3", ctypes.c_uint32), ("sig_data", ctypes.c_uint64),
    ]


def _open_cpu(libc, cpu: int) -> int:
    attr = perf_event_attr()
    attr.type = PERF_TYPE_SOFTWARE
    attr.size = ctypes.sizeof(perf_event_attr)
    attr.config = PERF_COUNT_SW_CPU_CLOCK
    attr.sample_period = 4_000_000  # 4 ms of CPU time -> 250 Hz per CPU
    attr.sample_type = PERF_SAMPLE_CALLCHAIN
    attr.flags = 1  # disabled=1; enabled via ioctl after mmap
    attr.sample_max_stack = 32
    fd = libc.syscall(SYS_perf_event_open, ctypes.byref(attr), -1, cpu, -1, 0)
    if fd < 0:
        raise OSError(ctypes.get_errno(),
                      f"perf_event_open failed on cpu {cpu} "
                      f"(need root or perf_event_paranoid<=1)")
    return fd


def _load_kallsyms() -> tuple[list[int], list[str]]:
    addrs, names = [], []
    pairs = []
    for line in open("/proc/kallsyms"):
        parts = line.split()
        if len(parts) >= 3 and parts[1].upper() in ("T", "W"):
            pairs.append((int(parts[0], 16), parts[2]))
    pairs.sort()
    for a, n in pairs:
        addrs.append(a)
        names.append(n)
    return addrs, names


def sample(seconds: float, top_n: int) -> None:
    libc = ctypes.CDLL(None, use_errno=True)
    fds, rings = [], []
    for cpu in range(os.cpu_count() or 1):
        fd = _open_cpu(libc, cpu)
        ring = mmap.mmap(fd, (RING_PAGES + 1) * 4096,
                         mmap.MAP_SHARED, mmap.PROT_READ | mmap.PROT_WRITE)
        fds.append(fd)
        rings.append(ring)
    for fd in fds:
        fcntl.ioctl(fd, PERF_EVENT_IOC_ENABLE, 0)
    time.sleep(seconds)
    for fd in fds:
        fcntl.ioctl(fd, PERF_EVENT_IOC_DISABLE, 0)

    addrs, names = _load_kallsyms()

    def sym(a: int) -> str:
        i = bisect.bisect_right(addrs, a) - 1
        return names[i] if i >= 0 else hex(a)

    stacks: collections.Counter[str] = collections.Counter()
    total = kernel = 0
    size = RING_PAGES * 4096
    for ring in rings:
        # perf_event_mmap_page.data_head lives at offset 1024
        head = struct.unpack_from("Q", ring, 1024)[0]
        data = bytes(ring[4096:(RING_PAGES + 1) * 4096])
        pos, end = 0, min(head, size)  # short windows: ring not wrapped
        while pos + 8 <= end:
            etype, _misc, esize = struct.unpack_from("IHH", data, pos)
            if esize == 0 or pos + esize > size:
                break
            if etype == PERF_RECORD_SAMPLE:
                nr = struct.unpack_from("Q", data, pos + 8)[0]
                if 0 < nr <= 64:
                    ips = struct.unpack_from(f"{nr}Q", data, pos + 16)
                    total += 1
                    kframes = [a for a in ips if KERNEL_LO <= a < KERNEL_HI]
                    if kframes:
                        kernel += 1
                        seen: list[str] = []
                        for a in kframes[1:6]:  # [0] is the context marker
                            s = sym(a)
                            if s not in seen:
                                seen.append(s)
                        stacks[";".join(seen[:4])] += 1
            pos += esize
    for ring in rings:
        ring.close()
    for fd in fds:
        os.close(fd)
    print(f"samples: {total} total, {kernel} with kernel frames "
          f"({100 * kernel / max(total, 1):.0f}%)")
    for stack, n in stacks.most_common(top_n):
        print(f"{n:7d}  {stack}")


if __name__ == "__main__":
    sample(float(sys.argv[1]) if len(sys.argv) > 1 else 10.0,
           int(sys.argv[2]) if len(sys.argv) > 2 else 25)
