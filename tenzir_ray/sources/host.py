"""Host-inspection sources (reference builtins/operators/files.cpp,
processes.cpp, sockets.cpp): point-in-time snapshots of the local host
as Datasets. Linux-only for processes/sockets (pure /proc parsing — no
psutil in this container); files works everywhere.

These are driver-side snapshot sources (the host being inspected is the
driver's host, exactly like the reference's node-local operators).
"""

from __future__ import annotations

import os
import stat as stat_mod


def files(root: str, recursive: bool = True, limit: int | None = None):
    """One row per file under ``root``: path, size, mtime, mode, type
    (reference files.cpp)."""
    import ray.data

    rows = []
    if recursive:
        walker = (
            os.path.join(dp, f) for dp, _dn, fn in os.walk(root) for f in fn
        )
    else:
        walker = (
            e.path for e in os.scandir(root) if e.is_file(follow_symlinks=False)
        )
    for p in walker:
        try:
            st = os.lstat(p)
        except OSError:
            continue
        rows.append(
            {
                "path": p,
                "size": st.st_size,
                "mtime": st.st_mtime,
                "mode": stat_mod.filemode(st.st_mode),
                "is_symlink": stat_mod.S_ISLNK(st.st_mode),
            }
        )
        if limit is not None and len(rows) >= limit:
            break
    return ray.data.from_items(rows) if rows else ray.data.from_items(
        [{"path": "", "size": 0, "mtime": 0.0, "mode": "", "is_symlink": False}]
    ).limit(0)


def processes(limit: int | None = None):
    """One row per running process: pid, ppid, name, state, cmdline,
    rss_kb (reference processes.cpp; /proc snapshot)."""
    import ray.data

    rows = []
    for pid_s in sorted(
        (d for d in os.listdir("/proc") if d.isdigit()), key=int
    ):
        try:
            with open(f"/proc/{pid_s}/stat") as f:
                stat_line = f.read()
            with open(f"/proc/{pid_s}/cmdline", "rb") as f:
                cmdline = f.read().replace(b"\0", b" ").decode(
                    "utf-8", errors="replace"
                ).strip()
        except OSError:
            continue
        # name is parenthesized and may contain spaces: rsplit past it
        lpar, rpar = stat_line.find("("), stat_line.rfind(")")
        name = stat_line[lpar + 1 : rpar]
        fields = stat_line[rpar + 2 :].split()
        rows.append(
            {
                "pid": int(pid_s),
                "ppid": int(fields[1]),
                "name": name,
                "state": fields[0],
                "cmdline": cmdline,
                "rss_kb": int(fields[21]) * os.sysconf("SC_PAGESIZE") // 1024,
            }
        )
        if limit is not None and len(rows) >= limit:
            break
    return ray.data.from_items(rows)


_TCP_STATES = {
    "01": "ESTABLISHED", "02": "SYN_SENT", "03": "SYN_RECV",
    "04": "FIN_WAIT1", "05": "FIN_WAIT2", "06": "TIME_WAIT",
    "07": "CLOSE", "08": "CLOSE_WAIT", "09": "LAST_ACK",
    "0A": "LISTEN", "0B": "CLOSING",
}


def _hex_addr(s: str) -> tuple[str, int]:
    addr, port = s.split(":")
    octets = [str(int(addr[i : i + 2], 16)) for i in (6, 4, 2, 0)]
    return ".".join(octets), int(port, 16)


def sockets(proto: str = "tcp"):
    """One row per socket from /proc/net/{tcp,udp}: local/remote
    addr+port, state, inode (reference sockets.cpp). IPv4 only —
    tcp6/udp6 use a different address layout and raise rather than
    silently mis-parse."""
    import ray.data

    if proto not in ("tcp", "udp"):
        raise ValueError(
            f"unsupported proto {proto!r}: only IPv4 'tcp'/'udp' are parsed"
        )
    rows = []
    with open(f"/proc/net/{proto}") as f:
        next(f)  # header
        for line in f:
            parts = line.split()
            la, lp = _hex_addr(parts[1])
            ra, rp = _hex_addr(parts[2])
            rows.append(
                {
                    "proto": proto,
                    "local_addr": la, "local_port": lp,
                    "remote_addr": ra, "remote_port": rp,
                    "state": _TCP_STATES.get(parts[3], parts[3]),
                    "inode": int(parts[9]),
                }
            )
    return ray.data.from_items(rows) if rows else ray.data.from_items(
        [{"proto": proto, "local_addr": "", "local_port": 0,
          "remote_addr": "", "remote_port": 0, "state": "", "inode": 0}]
    ).limit(0)
