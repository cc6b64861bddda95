"""Benchmark artifact IO: atomic, refuse-empty JSON writes.

Round-4 verdict (Weak #2): `gn_bench_r4.json` was committed as a 0-byte
file while docs cited numbers from it — a bench got interrupted after
`open(path, "w")` truncated the target.  Every bench result now goes
through :func:`write_json`, which serializes first, writes to a temp file
in the same directory, fsyncs, and renames — so the target path either
holds the complete previous artifact or the complete new one, never an
empty husk.
"""

import json
import os
import tempfile


def write_json(path: str, obj) -> str:
    """Atomically write ``obj`` as JSON to ``path``; refuse empty payloads."""
    data = json.dumps(obj, indent=1)
    if not data or data in ("{}", "[]", "null"):
        raise ValueError(
            f"refusing to write empty benchmark artifact to {path!r}: "
            f"payload={data!r}")
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(data)
            f.write("\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    print("wrote", path, flush=True)
    return path
