"""Native C++ runtime tests: PNG encoder and HTTP transport vs Python paths."""

import json
import socket
import threading
import time

import numpy as np
import pytest

from micro_raytracer_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built and no g++")


def test_png_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)

    p = tmp_path / "native.png"
    native.png_write(str(p), img)
    np.testing.assert_array_equal(np.asarray(Image.open(p)), img)

    import io

    data = native.png_encode(img)
    np.testing.assert_array_equal(np.asarray(Image.open(io.BytesIO(data))), img)


def test_png_rejects_bad_shape(tmp_path):
    with pytest.raises(Exception):
        native.png_write(str(tmp_path / "bad.png"),
                         np.zeros((0, 0, 3), np.uint8))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _req(port, raw: bytes) -> bytes:
    s = socket.create_connection(("127.0.0.1", port), timeout=60)
    s.sendall(raw)
    out = b""
    while True:
        chunk = s.recv(1 << 20)
        if not chunk:
            break
        out += chunk
    s.close()
    return out


@pytest.fixture()
def native_server():
    port = _free_port()
    calls = []

    def render_fn(body: bytes) -> bytes:
        calls.append(body)
        if body == b'{"boom": 1}':
            raise RuntimeError("render failed")
        return b"\xff\xd8FAKEJPEG" + body

    t = threading.Thread(target=native.http_serve,
                         args=("127.0.0.1", port, render_fn), daemon=True)
    t.start()
    time.sleep(0.2)
    yield port, calls
    native.http_stop()
    time.sleep(0.1)


def test_native_http_render_and_validation(native_server):
    port, calls = native_server
    body = json.dumps({"x": 1}).encode()
    raw = (b"POST / HTTP/1.1\r\nContent-Type: application/json\r\n"
           + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
    res = _req(port, raw)
    assert res.startswith(b"HTTP/1.1 200 OK")
    assert b"Content-Type: image/jpeg" in res
    assert b"\xff\xd8FAKEJPEG" in res
    assert calls == [body]

    # validation codes mirror the reference (http.rs:73-113)
    cases = [
        (b"POST / HTTP/1.0\r\nContent-Type: application/json\r\nContent-Length: 2\r\n\r\n{}", b"505"),
        (b"GET / HTTP/1.1\r\nContent-Type: application/json\r\nContent-Length: 2\r\n\r\n{}", b"405"),
        (b"POST / HTTP/1.1\r\nContent-Length: 2\r\n\r\n{}", b"400"),
        (b"POST / HTTP/1.1\r\nContent-Type: text/plain\r\nContent-Length: 2\r\n\r\n{}", b"415"),
        (b"POST / HTTP/1.1\r\nContent-Type: application/json\r\n\r\n{}", b"411"),
    ]
    for raw, code in cases:
        res = _req(port, raw)
        assert code in res.split(b"\r\n")[0], (raw, res)


def test_native_http_render_error_is_500(native_server):
    port, _ = native_server
    body = b'{"boom": 1}'
    raw = (b"POST / HTTP/1.1\r\nContent-Type: application/json\r\n"
           + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
    res = _req(port, raw)
    assert b"500" in res.split(b"\r\n")[0]
