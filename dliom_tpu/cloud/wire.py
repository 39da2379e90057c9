"""Length-prefixed msgpack framing with numpy array support.

Arrays travel as {"__nd__": raw bytes, "d": dtype str, "s": shape} — the
protobuf-equivalent of the reference's sensor protos (cloud/proto/)."""

from __future__ import annotations

import socket
import struct

import msgpack
import numpy as np

_MAX_FRAME = 1 << 28  # 256 MB


def _default(obj):
    if isinstance(obj, np.ndarray):
        a = np.ascontiguousarray(obj)
        return {"__nd__": a.tobytes(), "d": str(a.dtype), "s": list(a.shape)}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    raise TypeError(f"unserializable: {type(obj)}")


def _object_hook(obj):
    if "__nd__" in obj:
        return np.frombuffer(obj["__nd__"], dtype=obj["d"]).reshape(obj["s"])
    return obj


def send_msg(sock: socket.socket, msg) -> None:
    blob = msgpack.packb(msg, default=_default, use_bin_type=True)
    sock.sendall(struct.pack("<I", len(blob)) + blob)


def recv_msg(sock: socket.socket):
    header = _recv_exact(sock, 4)
    if header is None:
        return None
    (n,) = struct.unpack("<I", header)
    if n > _MAX_FRAME:
        raise ValueError(f"frame too large: {n}")
    blob = _recv_exact(sock, n)
    if blob is None:
        return None
    return msgpack.unpackb(blob, object_hook=_object_hook, raw=False)


def _recv_exact(sock: socket.socket, n: int):
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf.extend(chunk)
    return bytes(buf)
