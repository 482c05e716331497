# Web service integration tests: live HTTP server + queue over a stub
# pipeline (model execution tested elsewhere).
import json
import threading
import time
import urllib.request
import urllib.error

import numpy as np
import pytest


class StubPipeline:
    def __init__(self, path, model, config, progress_callback, cancel_check):
        self.path = path
        self.progress_callback = progress_callback
        self.cancel_check = cancel_check

    def run(self):
        self.progress_callback("PHASE:Transcription|working|50")
        if self.cancel_check and self.cancel_check():
            return None
        self.progress_callback("PHASE:Complete|done|100")
        return {
            "text": "xin chao",
            "segments": [{"text": "xin chao", "start": 0.0, "end": 1.0}],
            "timing": {"total": 0.1},
            "duration_sec": 1.0,
            "asr_confidence": 0.9,
            "quality_info": None,
            "overlap_segments": [],
        }


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from sherpa_vietnamese_asr_tpu.web_service.server import make_server

    data_dir = str(tmp_path_factory.mktemp("webdata"))
    server, state = make_server(
        data_dir=data_dir,
        model_provider=lambda name: None,
        pipeline_factory=StubPipeline)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, state
    server.shutdown()


def _req(base, path, method="GET", body=None, headers=None, raw=None):
    headers = dict(headers or {})
    data = raw
    if body is not None:
        data = json.dumps(body).encode()
        headers["Content-Type"] = "application/json"
    req = urllib.request.Request(base + path, data=data, method=method,
                                 headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_full_upload_process_flow(service):
    from sherpa_vietnamese_asr_tpu.utils.audio_io import write_wav
    base, state = service

    status, v = _req(base, "/api/version")
    assert status == 200 and "version" in v

    status, s = _req(base, "/api/session", "POST")
    assert status == 200
    sid = s["session_id"]
    H = {"X-Session-Id": sid}

    # upload a small wav
    import io
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        write_wav(f.name, np.zeros(16000, np.float32))
        wav_bytes = open(f.name, "rb").read()
    status, up = _req(base, "/api/upload", "POST",
                      headers={**H, "X-Filename": "test.wav"},
                      raw=wav_bytes)
    assert status == 200
    fid = up["file_id"]

    status, pr = _req(base, f"/api/process/{fid}", "POST", body={}, headers=H)
    assert status == 200

    # poll status until completed
    for _ in range(100):
        status, st = _req(base, f"/api/files/{fid}/status", headers=H)
        assert status == 200
        if st["status"] == "completed":
            break
        time.sleep(0.05)
    assert st["status"] == "completed"

    status, res = _req(base, f"/api/files/{fid}/result", headers=H)
    assert status == 200
    assert res["result"]["text"] == "xin chao"
    assert any(s["type"] == "text" for s in res["result"]["segments"])

    # speaker rename persists
    status, _ = _req(base, f"/api/files/{fid}/speakers", "POST",
                     body={"speaker_names": {"0": "Alice"}}, headers=H)
    assert status == 200
    status, res2 = _req(base, f"/api/files/{fid}/result", headers=H)
    assert res2["speaker_names"] == {"0": "Alice"}

    # access control: another session cannot read the file
    status, s2 = _req(base, "/api/session", "POST")
    H2 = {"X-Session-Id": s2["session_id"]}
    status, _ = _req(base, f"/api/files/{fid}/result", headers=H2)
    assert status == 403


def test_auth_and_admin_flow(service):
    base, state = service
    # wrong password x5 -> lockout 429
    for i in range(5):
        status, _ = _req(base, "/api/auth/login", "POST",
                         body={"username": "ghost", "password": "x"})
        assert status == 401
    status, _ = _req(base, "/api/auth/login", "POST",
                     body={"username": "ghost", "password": "x"})
    assert status == 429
    state.login_limiter.clear()
    state.account_limiter.clear()

    # admin login
    status, login = _req(base, "/api/auth/login", "POST",
                         body={"username": "admin", "password": "admin"})
    assert status == 200
    tok = {"Authorization": f"Bearer {login['token']}"}

    status, me = _req(base, "/api/auth/me", headers=tok)
    assert status == 200 and me["user"]["role"] == "admin"

    # admin endpoints
    status, stats = _req(base, "/api/admin/stats", headers=tok)
    assert status == 200 and "files" in stats["stats"]
    status, _ = _req(base, "/api/admin/users", "POST", headers=tok,
                     body={"username": "alice", "password": "secret123"})
    assert status == 200
    status, users = _req(base, "/api/admin/users", headers=tok)
    assert any(u["username"] == "alice" for u in users["users"])

    # non-admin cannot reach admin endpoints
    status, alogin = _req(base, "/api/auth/login", "POST",
                          body={"username": "alice", "password": "secret123"})
    atok = {"Authorization": f"Bearer {alogin['token']}"}
    status, _ = _req(base, "/api/admin/stats", headers=atok)
    assert status == 403

    # logout revokes the token
    status, _ = _req(base, "/api/auth/logout", "POST", headers=atok)
    status, _ = _req(base, "/api/auth/me", headers=atok)
    assert status == 401


def test_queue_pause_resume_and_cancel(service):
    base, state = service
    status, login = _req(base, "/api/auth/login", "POST",
                         body={"username": "admin", "password": "admin"})
    tok = {"Authorization": f"Bearer {login['token']}"}
    status, _ = _req(base, "/api/admin/queue/pause", "POST", headers=tok)
    assert status == 200 and state.queue.paused
    status, q = _req(base, "/api/admin/queue", headers=tok)
    assert status == 200
    status, _ = _req(base, "/api/admin/queue/resume", "POST", headers=tok)
    assert not state.queue.paused


def test_jwt_and_passwords():
    from sherpa_vietnamese_asr_tpu.web_service.auth import (
        JwtAuth, hash_password, verify_password,
    )
    auth = JwtAuth()
    tok = auth.create_token({"user_id": 1})
    assert auth.verify_token(tok)["user_id"] == 1
    assert auth.verify_token(tok + "x") is None
    auth.revoke_token(tok)
    assert auth.verify_token(tok) is None
    expired = auth.create_token({"user_id": 2}, ttl=-1)
    assert auth.verify_token(expired) is None

    h = hash_password("hunter2")
    assert verify_password("hunter2", h)
    assert not verify_password("hunter3", h)
    assert hash_password("hunter2") != h  # salted


def test_slider_confidence_mapping():
    from sherpa_vietnamese_asr_tpu.web_service.queue_manager import (
        slider_to_confidences,
    )
    p, c, bypass = slider_to_confidences(5, 5)
    assert abs(p - (0.5 - 4 * 1.3 / 9)) < 1e-9
    assert abs(c - (-1.5 + 4 * 2.0 / 9)) < 1e-9
    assert not bypass
    assert slider_to_confidences(1, 5)[2] is True
    assert abs(slider_to_confidences(10, 10)[0] - (0.5 - 1.3)) < 1e-9


def test_ws_stream_live_transcription(service):
    """Raw-socket WebSocket client streams PCM16 to /ws/stream and gets
    ready -> partial(s) -> final JSON frames."""
    import base64
    import json
    import socket
    import struct

    import numpy as np

    from sherpa_vietnamese_asr_tpu.models.registry import (
        TINY_ZIPFORMER, random_asr_model,
    )
    from sherpa_vietnamese_asr_tpu.pipeline.streaming_online import (
        MultiStreamRecognizer,
    )

    base, state = service
    # tiny streamer so the CPU test compiles fast
    model = random_asr_model(vocab_size=60, zip_cfg=TINY_ZIPFORMER,
                             beam_size=2)
    state._streamer = MultiStreamRecognizer(model, n_streams=2,
                                            chunk_frames=32, left_frames=64)

    host, port = base.replace("http://", "").split(":")
    sock = socket.create_connection((host, int(port)), timeout=60)
    key = base64.b64encode(b"0123456789abcdef").decode()
    sock.sendall((f"GET /ws/stream HTTP/1.1\r\nHost: {host}\r\n"
                  "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                  f"Sec-WebSocket-Key: {key}\r\n"
                  "Sec-WebSocket-Version: 13\r\n\r\n").encode())
    # read the 101 response headers
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += sock.recv(1024)
    assert b"101" in buf.split(b"\r\n", 1)[0]

    def client_frame(payload, opcode):
        mask = b"\x01\x02\x03\x04"
        head = bytes([0x80 | opcode])
        n = len(payload)
        if n < 126:
            head += bytes([0x80 | n])
        else:
            head += bytes([0x80 | 126]) + struct.pack(">H", n)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        return head + mask + masked

    def read_server_frame(sock):
        head = sock.recv(2)
        opcode = head[0] & 0x0F
        ln = head[1] & 0x7F
        if ln == 126:
            ln = struct.unpack(">H", sock.recv(2))[0]
        data = b""
        while len(data) < ln:
            data += sock.recv(ln - len(data))
        return opcode, data

    op, data = read_server_frame(sock)
    msg = json.loads(data)
    assert msg["type"] == "ready"

    sr = 16000
    t = np.arange(sr * 2) / sr
    audio = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    pcm = np.clip(np.rint(audio * 32768), -32768, 32767).astype(np.int16)
    partials = []
    for off in range(0, len(pcm), 8000):
        sock.sendall(client_frame(pcm[off: off + 8000].tobytes(), 0x2))
        sock.settimeout(0.5)
        try:
            while True:
                op, data = read_server_frame(sock)
                m = json.loads(data)
                if m["type"] == "partial":
                    partials.append(m["text"])
        except (socket.timeout, TimeoutError):
            pass
    sock.settimeout(120)
    sock.sendall(client_frame(b"", 0x8))  # close
    finals = []
    try:
        while True:
            op, data = read_server_frame(sock)
            m = json.loads(data)
            if m["type"] == "partial":
                # first-compile latency can delay partials past the short
                # read windows above; they still arrive before the final
                partials.append(m["text"])
            if m["type"] == "final":
                finals.append(m["text"])
                break
    except (socket.timeout, TimeoutError, IndexError):
        pass
    sock.close()
    assert partials, "expected at least one partial"
    assert finals and isinstance(finals[0], str)


def test_queue_position_pushed_to_second_client(service):
    """A second queued upload sees its queue position arrive PUSH-style over
    /ws — position 2 while another job is ahead of it, then 1 when that job
    starts (reference web_service/queue_manager.py:183-239 +
    session_manager.py WebSocketManager broadcast)."""
    import base64
    import socket
    import struct
    import tempfile

    from sherpa_vietnamese_asr_tpu.utils.audio_io import write_wav

    base, state = service
    _, s = _req(base, "/api/session", "POST")
    H = {"X-Session-Id": s["session_id"]}

    # open a push socket on /ws for this session
    host, port = base.replace("http://", "").split(":")
    sock = socket.create_connection((host, int(port)), timeout=30)
    key = base64.b64encode(b"fedcba9876543210").decode()
    sock.sendall((f"GET /ws HTTP/1.1\r\nHost: {host}\r\n"
                  "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                  f"Sec-WebSocket-Key: {key}\r\n"
                  f"X-Session-Id: {s['session_id']}\r\n"
                  "Sec-WebSocket-Version: 13\r\n\r\n").encode())
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += sock.recv(1024)
    assert b"101" in buf.split(b"\r\n", 1)[0]

    def read_events(deadline_sec=10.0):
        sock.settimeout(deadline_sec)
        head = sock.recv(2)
        if len(head) < 2:
            return None
        ln = head[1] & 0x7F
        if ln == 126:
            ln = struct.unpack(">H", sock.recv(2))[0]
        payload = b""
        while len(payload) < ln:
            payload += sock.recv(ln - len(payload))
        return json.loads(payload.decode())

    # pause the queue, enqueue two files from two sessions (an anonymous
    # session keeps ONE file: a second upload replaces the first, reference
    # server.py:866-875) -> both adds broadcast positions
    _, s2 = _req(base, "/api/session", "POST")
    H2 = {"X-Session-Id": s2["session_id"]}
    state.queue.pause()
    try:
        fids = []
        heads = []
        for name, hdr in (("q1.wav", H), ("q2.wav", H2)):
            with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                write_wav(f.name, np.zeros(8000, np.float32))
                wav = open(f.name, "rb").read()
            _, up = _req(base, "/api/upload", "POST",
                         headers={**hdr, "X-Filename": name}, raw=wav)
            fids.append(up["file_id"])
            heads.append(hdr)
            status, pr = _req(base, f"/api/process/{fids[-1]}", "POST",
                              body={}, headers=hdr)
            assert status == 200
        assert pr["queue_position"] == 2  # second upload is behind the first

        # the paused adds already pushed position events for file 2
        seen = {}
        for _ in range(8):
            ev = read_events()
            if ev and ev.get("type") == "queue_position":
                seen.setdefault(ev["file_id"], []).append(ev["position"])
            if 2 in seen.get(fids[1], []):
                break
        assert 2 in seen.get(fids[1], []), seen
    finally:
        state.queue.resume()
    state.queue.process_next()

    # when file 1 starts processing, file 2's position drops to 1 — pushed,
    # not polled
    for _ in range(20):
        ev = read_events()
        if (ev and ev.get("type") == "queue_position"
                and ev["file_id"] == fids[1] and ev["position"] == 1):
            break
    else:
        raise AssertionError("no pushed position-1 update for second file")
    sock.close()

    # drain: wait for both to finish so later tests see an idle queue
    for fid, hdr in zip(fids, heads):
        for _ in range(200):
            _, st = _req(base, f"/api/files/{fid}/status", headers=hdr)
            if st.get("status") in ("completed", "error"):
                break
            time.sleep(0.05)
