"""Streams (core/stream.py) — typed I/O over every transport.

Mirrors the reference's stream semantics (stream.h:58): endianness
switching, exact-length reads, NUL-terminated strings, and the
file/memory/socket/pipe/zlib/console implementations.
"""

import os
import socket
import sys
import threading

import numpy as np
import pytest

from mitsuba_tpu.core.stream import (
    ConsoleStream,
    EOFError_,
    FileStream,
    MemoryMappedFile,
    MemoryStream,
    PipeStream,
    SocketStream,
    Stream,
    StreamError,
    ZStream,
)

pytestmark = pytest.mark.fast


def _roundtrip(ws, rs=None):
    """Write one of each type, read them back."""
    ws.write_bool(True)
    ws.write_u8(200)
    ws.write_i8(-100)
    ws.write_u16(60000)
    ws.write_i16(-30000)
    ws.write_u32(4000000000)
    ws.write_i32(-2000000000)
    ws.write_u64(1 << 60)
    ws.write_i64(-(1 << 60))
    ws.write_f32(3.25)
    ws.write_f64(-1.0 / 3.0)
    ws.write_string("héllo")
    ws.write_line("a line")
    ws.write_array(np.arange(7, dtype=np.float32))
    ws.write_blob(b"blobby")
    ws.flush()
    if rs is None:
        rs = ws
        if ws.can_seek:
            ws.seek(0)
    assert rs.read_bool() is True
    assert rs.read_u8() == 200
    assert rs.read_i8() == -100
    assert rs.read_u16() == 60000
    assert rs.read_i16() == -30000
    assert rs.read_u32() == 4000000000
    assert rs.read_i32() == -2000000000
    assert rs.read_u64() == 1 << 60
    assert rs.read_i64() == -(1 << 60)
    assert rs.read_f32() == 3.25
    assert rs.read_f64() == -1.0 / 3.0
    assert rs.read_string() == "héllo"
    assert rs.read_line() == "a line"
    np.testing.assert_array_equal(
        rs.read_array(np.float32, 7), np.arange(7, dtype=np.float32)
    )
    assert rs.read_blob() == b"blobby"


@pytest.mark.parametrize("order", ["little", "big", "network"])
def test_memory_roundtrip(order):
    s = MemoryStream()
    s.set_byte_order(order)
    _roundtrip(s)
    s.seek(0)


def test_byte_order_bytes_actually_swap():
    le, be = MemoryStream(), MemoryStream()
    be.set_byte_order("big")
    le.write_u32(0x01020304)
    be.write_u32(0x01020304)
    assert le.getvalue() == b"\x04\x03\x02\x01"
    assert be.getvalue() == b"\x01\x02\x03\x04"
    # array path too
    be.seek(0)
    np.testing.assert_array_equal(
        be.read_array(np.uint32, 1), [0x01020304]
    )


def test_file_roundtrip(tmp_path):
    p = str(tmp_path / "s.bin")
    with FileStream(p, "w") as s:
        _roundtrip_write = s
        s.write_u32(7)
        s.write_string("x")
    with FileStream(p, "r") as s:
        assert s.size() == 4 + 2
        assert s.read_u32() == 7
        assert s.read_string() == "x"
        with pytest.raises(EOFError_):
            s.read_u8()
        with pytest.raises(StreamError):
            s.write_u8(1)
    with FileStream(p, "rw") as s:
        s.seek(0)
        s.write_u32(9)
        s.seek(0)
        assert s.read_u32() == 9


def test_socket_roundtrip():
    a, b = socket.socketpair()
    ws, rs = SocketStream(a), SocketStream(b)
    done = []

    def writer():
        _roundtrip(ws, rs)
        done.append(1)

    t = threading.Thread(target=writer)
    t.start()
    t.join(timeout=30)
    assert done == [1]
    ws.close()
    with pytest.raises(EOFError_):
        rs.read_u32()
    rs.close()


def test_pipe_roundtrip_cat_loopback():
    # `cat` echoes stdin to stdout — the ssh_stream transport shape
    s = PipeStream(["cat"])
    s.write_u64(123456789)
    s.write_string("over the pipe")
    s.write_array(np.arange(5, dtype=np.int16))
    s.close_write()
    assert s.read_u64() == 123456789
    assert s.read_string() == "over the pipe"
    np.testing.assert_array_equal(
        s.read_array(np.int16, 5), np.arange(5, dtype=np.int16)
    )
    s.close()


def test_zstream_over_memory():
    inner = MemoryStream()
    z = ZStream(inner, level=9)
    payload = np.zeros(100_000, np.float32)  # very compressible
    z.write_array(payload)
    z.write_string("tail")
    z.finish()
    assert inner.size() < payload.nbytes // 50
    inner.seek(0)
    r = ZStream(inner)
    np.testing.assert_array_equal(
        r.read_array(np.float32, payload.size), payload
    )
    assert r.read_string() == "tail"


def test_zstream_over_socket_bidirectional():
    a, b = socket.socketpair()
    za, zb = ZStream(SocketStream(a)), ZStream(SocketStream(b))

    def side_a():
        za.write_string("ping " * 1000)
        za.flush()  # Z_SYNC_FLUSH makes bytes visible without finish()
        assert zb_reply[0] == za.read_string()

    zb_reply = ["pong " * 1000]
    t = threading.Thread(target=side_a)
    t.start()
    assert zb.read_string() == "ping " * 1000
    zb.write_string(zb_reply[0])
    zb.flush()
    t.join(timeout=30)


def test_console_stream_objects():
    import io

    out = io.BytesIO()
    s = ConsoleStream(stdin=io.BytesIO(b"\x05\x00hi"), stdout=out)
    s.write_u16(0x0102)
    assert out.getvalue() == b"\x02\x01"
    assert s.read_u16() == 5
    assert s.read(2) == b"hi"


def test_mmap_views(tmp_path):
    p = str(tmp_path / "grid.raw")
    data = np.arange(64, dtype=np.float32)
    data.tofile(p)
    with MemoryMappedFile(p) as m:
        v = m.view(np.float32)
        np.testing.assert_array_equal(v, data)
        del v  # numpy views must be dropped before the mapping closes
    with MemoryMappedFile(p, write=True) as m:
        m.view(np.float32)  # read view still works
        m.data[0:4] = np.float32(99).tobytes()
        m.flush()
    assert np.fromfile(p, np.float32)[0] == 99


def test_pack_over_stream_roundtrip(tmp_path):
    """ScenePack serialization rides streams (ENewResource analogue):
    the same pack bytes over a ZStream-wrapped socketpair reconstruct
    an identical pack."""
    from mitsuba_tpu.scene.builder import ScenePack
    from mitsuba_tpu.scene.serialize import load_pack, save_pack

    pack = ScenePack(
        {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
         "b": np.array([1, 2, 3], np.int32)},
        {"n": 3, "kinds": ("x", "y")},
    )
    # over memory
    ms = MemoryStream()
    save_pack(pack, ms)
    ms.seek(0)
    back = load_pack(ms)
    np.testing.assert_array_equal(back.arrays["a"], pack.arrays["a"])
    assert back.meta == pack.meta
    # over a real socket
    a, b = socket.socketpair()
    sa, sb = SocketStream(a), SocketStream(b)
    t = threading.Thread(target=save_pack, args=(pack, sa))
    t.start()
    back2 = load_pack(sb)
    t.join(timeout=30)
    np.testing.assert_array_equal(back2.arrays["b"], pack.arrays["b"])
    assert back2.meta == pack.meta
    sa.close()
    sb.close()


def test_exact_read_short_raises():
    s = MemoryStream(b"abc")
    with pytest.raises(EOFError_):
        s.read(5)
