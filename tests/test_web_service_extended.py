# Extended web-service surface tests: pages, TLS/install-cert, session
# status, JSON import/export, audio serving, queue position, server config,
# admin/localhost user management, calibration mode switches, and upload
# validation — the reference server.py endpoints added for full parity.
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest


class StubPipeline:
    def __init__(self, path, model, config, progress_callback, cancel_check):
        self.progress_callback = progress_callback
        self.cancel_check = cancel_check

    def run(self):
        self.progress_callback("PHASE:Complete|done|100")
        return {"text": "xin chao",
                "segments": [{"text": "xin chao", "start": 0.0, "end": 1.0}],
                "timing": {}, "duration_sec": 1.0, "asr_confidence": 0.9,
                "quality_info": None, "overlap_segments": []}


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from sherpa_vietnamese_asr_tpu.web_service.server import make_server

    data_dir = str(tmp_path_factory.mktemp("webdata_ext"))
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


def _raw(base, path, headers=None):
    """GET returning (status, headers, bytes) for non-JSON responses."""
    req = urllib.request.Request(base + path, headers=dict(headers or {}))
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def _session(base):
    _, s = _req(base, "/api/session", "POST")
    return {"X-Session-Id": s["session_id"]}


def _upload_wav(base, headers, name="a.wav", seconds=0.5):
    import tempfile

    from sherpa_vietnamese_asr_tpu.utils.audio_io import write_wav

    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        write_wav(f.name, np.zeros(int(16000 * seconds), np.float32))
        wav = open(f.name, "rb").read()
    _, up = _req(base, "/api/upload", "POST",
                 headers={**headers, "X-Filename": name}, raw=wav)
    return up["file_id"]


def _admin_token(base):
    _, login = _req(base, "/api/auth/login", "POST",
                    body={"username": "admin", "password": "admin"})
    return {"Authorization": f"Bearer {login['token']}"}


def test_index_and_login_pages(service):
    base, _state = service
    for path in ("/", "/login"):
        status, headers, body = _raw(base, path)
        assert status == 200
        assert "text/html" in headers.get("Content-Type", "")
        assert b"Sherpa Vietnamese ASR" in body


def test_install_cert_flow(service, tmp_path):
    import os

    from sherpa_vietnamese_asr_tpu.web_service import ssl_utils

    base, state = service
    os.environ.pop(ssl_utils.ACTIVE_CERT_ENV, None)
    status, _h, _b = _raw(base, "/install-cert")
    assert status == 404  # no cert configured yet

    cert, key = ssl_utils.ensure_ssl_certs(state.cert_dir)
    assert cert and key and os.path.exists(cert)
    # second call reuses instead of regenerating
    again = ssl_utils.ensure_ssl_certs(state.cert_dir)
    assert again == (cert, key)
    try:
        ssl_utils.publish_active_ssl_cert(cert, key,
                                          data_dir=state.data_dir)
        status, headers, body = _raw(base, "/install-cert")
        assert status == 200
        assert b"BEGIN CERTIFICATE" in body
        assert "sherpa-asr-vn.crt" in headers.get("Content-Disposition", "")
    finally:
        os.environ.pop(ssl_utils.ACTIVE_CERT_ENV, None)
        os.environ.pop(ssl_utils.ACTIVE_KEY_ENV, None)


def test_custom_cert_priority(tmp_path):
    from sherpa_vietnamese_asr_tpu.web_service import ssl_utils

    cert_dir = str(tmp_path / "certs")
    cert, key = ssl_utils.ensure_ssl_certs(cert_dir)
    assert cert.endswith("server.crt")
    # a custom pair takes priority over the generated one
    for name, src in (("custom.crt", cert), ("custom.key", key)):
        with open(src, "rb") as f, \
                open(f"{cert_dir}/{name}", "wb") as out:
            out.write(f.read())
    cert2, key2 = ssl_utils._configured_cert_pair(cert_dir)
    assert cert2.endswith("custom.crt") and key2.endswith("custom.key")


def test_https_serving(tmp_path):
    import ssl

    from sherpa_vietnamese_asr_tpu.web_service.server import make_server

    server, state = make_server(data_dir=str(tmp_path / "tls_data"),
                                model_provider=lambda name: None,
                                use_tls=True)
    assert state.tls_active
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        url = f"https://127.0.0.1:{server.server_address[1]}/api/version"
        with urllib.request.urlopen(url, timeout=30, context=ctx) as resp:
            assert json.loads(resp.read())["backend"] == "jax-tpu"
    finally:
        server.shutdown()


def test_session_status(service):
    base, _state = service
    H = _session(base)
    status, st = _req(base, "/api/session/status", headers=H)
    assert status == 200
    assert st["is_anonymous"] and st["latest_file"] is None

    fid = _upload_wav(base, H)
    _req(base, f"/api/process/{fid}", "POST", body={}, headers=H)
    for _ in range(100):
        _, fs = _req(base, f"/api/files/{fid}/status", headers=H)
        if fs["status"] in ("completed", "error"):
            break
        time.sleep(0.05)
    status, st = _req(base, "/api/session/status", headers=H)
    assert st["latest_file"]["file_id"] == fid
    assert st["latest_file"]["has_result"]

    status, _ = _req(base, "/api/session/status",
                     headers={"X-Session-Id": "nope"})
    assert status == 404


def test_upload_json_sanitizes_and_downloads(service):
    base, _state = service
    H = _session(base)
    fid = _upload_wav(base, H, name="meeting.wav")

    payload = {
        "segments": [
            {"type": "text", "text": "<script>alert(1)</script>hello",
             "start": 0.0, "end": 1.0, "confidence": 7.5},
            {"type": "speaker", "speaker": "<b>Spk</b>",
             "speaker_id": 1000},      # out-of-range id dropped
            {"type": "bogus", "text": "dropped"},
        ],
        "speaker_names": {"0": "<i>Alice</i>"},
        "speaker_colors": {"0": "#ff0000", "1": "javascript:alert(1)"},
        "model": "imported-model", "duration_sec": "12.5",
        "evil_key": "dropped",
    }
    status, r = _req(base, f"/api/upload-json/{fid}", "POST", body=payload,
                     headers=H)
    assert status == 200 and r["success"]

    _, res = _req(base, f"/api/files/{fid}/result", headers=H)
    data = res["result"]
    assert "evil_key" not in data
    segs = data["segments"]
    assert len(segs) == 2  # bogus type dropped
    assert "&lt;script&gt;" in segs[0]["text"]
    assert segs[0]["confidence"] == 1.0  # clamped
    assert "speaker_id" not in segs[1]
    assert data["speaker_names"]["0"] == "&lt;i&gt;Alice&lt;/i&gt;"
    assert data["speaker_colors"] == {"0": "#ff0000"}
    assert data["duration_sec"] == 12.5

    # structured download with RFC 5987 attachment name
    status, headers, body = _raw(base, f"/api/files/{fid}/download-json",
                                 headers=H)
    assert status == 200
    assert "meeting.asr.json" in headers.get("Content-Disposition", "")
    assert json.loads(body.decode())["model"] == "imported-model"

    # missing segments rejected
    status, _ = _req(base, f"/api/upload-json/{fid}", "POST",
                     body={"text": "no segments"}, headers=H)
    assert status == 400


def test_file_audio_serving(service):
    base, _state = service
    H = _session(base)
    fid = _upload_wav(base, H, name="talk.wav")

    status, headers, body = _raw(base, f"/api/files/{fid}/audio", headers=H)
    assert status == 200
    assert headers["Content-Type"] == "audio/wav"
    assert body[:4] == b"RIFF"

    status, headers, body = _raw(base, f"/api/files/{fid}/download-audio",
                                 headers=H)
    assert status == 200
    assert "attachment" in headers.get("Content-Disposition", "")
    assert "talk.wav" in headers["Content-Disposition"]

    # other sessions are denied
    H2 = _session(base)
    status, _h, _b = _raw(base, f"/api/files/{fid}/audio", headers=H2)
    assert status == 403


def test_queue_position_endpoint(service):
    base, state = service
    H = _session(base)
    fid = _upload_wav(base, H)
    state.queue.pause()
    try:
        _req(base, f"/api/process/{fid}", "POST", body={}, headers=H)
        status, pos = _req(base, f"/api/queue/position/{fid}", headers=H)
        assert status == 200
        assert pos["position"] >= 1 and pos["total"] >= 1
    finally:
        state.queue.resume()
        state.queue.process_next()
        state.queue.wait_idle(timeout=30)


def test_save_result_requires_auth_and_syncs_meeting(service):
    base, state = service
    H = _session(base)
    fid = _upload_wav(base, H)
    _req(base, f"/api/upload-json/{fid}", "POST", headers=H,
         body={"segments": [{"type": "text", "text": "before"}]})

    edited = {"asr_result": {"segments": [
        {"type": "text", "text": "after", "start": 0.0}]}}
    status, _ = _req(base, f"/api/files/{fid}/save-result", "POST",
                     body=edited, headers=H)
    assert status == 401  # anonymous may not save edits

    tok = _admin_token(base)
    admin = state.db.get_user_by_username("admin")
    mid = state.db.create_meeting(admin["id"], fid, "standup", "a.wav",
                                  state.db.get_file(fid)["stored_filename"])
    status, _ = _req(base, f"/api/files/{fid}/save-result", "POST",
                     body=edited, headers={**H, **tok})
    assert status == 200
    rec = state.db.get_file(fid)
    assert "after" in rec["asr_result_json"]
    meeting = state.db.get_meeting(mid)
    assert "after" in meeting["asr_result_json"]  # best-effort sync

    status, _ = _req(base, f"/api/files/{fid}/save-result", "POST",
                     body={"asr_result": "not a dict"}, headers={**H, **tok})
    assert status == 400


def test_upload_validation(service):
    base, state = service
    H = _session(base)
    # extension allowlist
    status, r = _req(base, "/api/upload", "POST",
                     headers={**H, "X-Filename": "evil.exe"}, raw=b"MZ")
    assert status == 400 and "format" in r["detail"].lower()

    # anonymous keeps one file: a second upload replaces the first
    fid1 = _upload_wav(base, H, name="first.wav")
    fid2 = _upload_wav(base, H, name="second.wav")
    assert state.db.get_file(fid1) is None
    assert state.db.get_file(fid2) is not None

    # config-driven size cap
    state.config.set("max_upload_mb", 1)
    try:
        status, r = _req(base, "/api/upload", "POST",
                         headers={**H, "X-Filename": "big.wav"},
                         raw=b"\0" * (1024 * 1024 + 1))
        assert status == 413
    finally:
        state.config.set("max_upload_mb", 500)

    # per-key sliding-window rate limit
    with pytest.raises(Exception):
        for _ in range(20):
            state.check_upload_rate(H["X-Session-Id"])


def test_admin_config_endpoints(service):
    base, state = service
    tok = _admin_token(base)

    status, cfg = _req(base, "/api/admin/config", headers=tok)
    assert status == 200
    assert "max_upload_mb" in cfg and "admin_password_hash" not in cfg

    status, r = _req(base, "/api/admin/config", "PUT", headers=tok,
                     body={"max_upload_mb": 250, "host": "1.2.3.4",
                           "unknown_key": "x"})
    assert status == 200
    assert r["changed"] == ["max_upload_mb"]  # readonly + unknown skipped
    assert state.config.get_int("max_upload_mb") == 250
    assert state.config.get("host") != "1.2.3.4"

    status, _ = _req(base, "/api/admin/config", "PUT", headers=tok,
                     body={"max_upload_mb": 999999})
    assert status == 400  # validator rejects
    state.config.set("max_upload_mb", 500)

    # no auth -> 401
    status, _ = _req(base, "/api/admin/config")
    assert status == 401


def test_admin_user_management(service):
    base, state = service
    tok = _admin_token(base)

    status, r = _req(base, "/api/admin/users", "POST", headers=tok,
                     body={"username": "bob", "password": "longenough1",
                           "storage_limit_gb": 2.5})
    assert status == 200
    uid = r["user_id"]

    # short password rejected (reference: >= 8 chars)
    status, _ = _req(base, "/api/admin/users", "POST", headers=tok,
                     body={"username": "carl", "password": "short"})
    assert status == 400

    status, _ = _req(base, f"/api/admin/users/{uid}", "PUT", headers=tok,
                     body={"storage_limit_gb": 9.0, "is_active": False})
    assert status == 200
    u = state.db.get_user_by_id(uid)
    assert u["storage_limit_gb"] == 9.0 and u["is_active"] == 0

    status, _ = _req(base, f"/api/admin/users/{uid}/reset-password",
                     "POST", headers=tok, body={"password": "newpass123"})
    assert status == 200

    # admins cannot be deleted (reference server.py:2084-2093)
    admin = state.db.get_user_by_username("admin")
    status, _ = _req(base, f"/api/admin/users/{admin['id']}", "DELETE",
                     headers=tok)
    assert status == 400

    status, _ = _req(base, f"/api/admin/users/{uid}", "DELETE", headers=tok)
    assert status == 200
    assert state.db.get_user_by_id(uid) is None


def test_localhost_gui_admin_api(service):
    base, state = service
    # client connects from 127.0.0.1 -> allowed without JWT
    status, r = _req(base, "/api/stats")
    assert status == 200 and "files" in r["stats"]

    status, r = _req(base, "/api/local/sessions")
    assert status == 200 and isinstance(r["sessions"], list)

    status, r = _req(base, "/api/local/queue")
    assert status == 200 and "paused" in r

    status, r = _req(base, "/api/local/users", "POST",
                     body={"username": "localadminmade",
                           "password": "password123"})
    assert status == 200
    uid = r["user_id"]
    status, _ = _req(base, f"/api/local/users/{uid}", "DELETE")
    assert status == 200

    # kill-session alias cancels + expires
    _, s = _req(base, "/api/session", "POST")
    sid = s["session_id"]
    status, r = _req(base, f"/api/local/sessions/{sid}", "DELETE")
    assert status == 200 and r["success"]
    assert state.db.get_session(sid) is None

    status, r = _req(base, "/api/local/sessions/cleanup", "POST")
    assert status == 200 and "cleaned_count" in r

    status, _ = _req(base, "/api/local/rate-limits")
    assert status == 200
    status, _ = _req(base, "/api/local/rate-limits/clear", "POST")
    assert status == 200


def test_admin_session_endpoints(service):
    base, state = service
    tok = _admin_token(base)
    _, s = _req(base, "/api/session", "POST")
    sid = s["session_id"]

    status, r = _req(base, "/api/admin/sessions", headers=tok)
    assert status == 200
    assert any(x["id"] == sid for x in r["sessions"])

    status, r = _req(base, f"/api/admin/sessions/{sid}", "DELETE",
                     headers=tok)
    assert status == 200
    assert state.db.get_session(sid) is None

    status, r = _req(base, "/api/admin/sessions/cleanup", "POST",
                     headers=tok)
    assert status == 200


def test_calibration_endpoints(service):
    base, state = service
    status, st = _req(base, "/api/calibration/status")
    assert status == 200
    assert "current_execution_provider" in st
    assert "current_serving_profile" in st

    # no saved calibration -> auto switch rejected
    status, _ = _req(base, "/api/calibration/gpu-auto", "POST", body={})
    assert status == 400

    status, r = _req(base, "/api/calibration/cpu-only", "POST", body={})
    assert status == 200
    assert state.config.get("execution_provider") == "cpu"
    state.config.set("execution_provider", "auto")

    # a saved report with accepted stages unlocks auto
    import os
    report_path = os.path.join(state.data_dir, "calibration_report.json")
    with open(report_path, "w") as f:
        json.dump({"accelerated_stages": ["encoder"]}, f)
    status, r = _req(base, "/api/calibration/gpu-auto", "POST", body={})
    assert status == 200
    assert r["current_execution_provider"] == "auto"


def test_defaults_are_config_driven(service):
    base, state = service
    status, d = _req(base, "/api/config/defaults")
    assert status == 200
    assert d["punctuation_confidence"] == 7 and d["case_confidence"] == 6
    assert d["asr_model"] == state.config.get("default_asr_model")
    assert d["max_upload_mb"] == state.config.get_int("max_upload_mb")


def test_server_config_persistence(tmp_path):
    from sherpa_vietnamese_asr_tpu.web_service.server_config import (
        ServerConfig,
    )

    path = str(tmp_path / "config.ini")
    cfg = ServerConfig(path)
    assert cfg.get("port") == "8443"  # reference default
    cfg.set("max_upload_mb", 123)
    cfg.save()
    cfg2 = ServerConfig(path)
    assert cfg2.get_int("max_upload_mb") == 123
    assert cfg2.max_upload_bytes == 123 * 1024 * 1024

    assert cfg2.validate("port", 8080)
    assert not cfg2.validate("port", 99999)
    assert not cfg2.validate("serving_dtype", "int8")
    assert cfg2.validate("unknown_future_key", "anything")


def test_sanitize_asr_json_unit():
    from sherpa_vietnamese_asr_tpu.web_service.server import (
        ApiError,
        sanitize_asr_json,
    )

    out = sanitize_asr_json({
        "segments": [{"type": "text", "text": "a" * 100_000,
                      "start": "0.5"}],
        "model": "m" * 500,
    })
    assert len(out["segments"][0]["text"]) == 50_000
    assert out["segments"][0]["start"] == 0.5
    assert len(out["model"]) == 200

    with pytest.raises(ApiError):
        sanitize_asr_json({"segments": "not a list"})


def test_convert_to_wav_and_artifact_cleanup(service, tmp_path,
                                             monkeypatch):
    """Non-WAV uploads are pre-converted via ffmpeg when present (gated:
    returns None without ffmpeg), and file deletion removes the converted
    .wav sibling along with the original."""
    import os
    import shutil as _shutil

    from sherpa_vietnamese_asr_tpu.web_service.queue_manager import (
        convert_to_wav,
    )
    from sherpa_vietnamese_asr_tpu.web_service.server import (
        delete_upload_artifacts,
    )

    src = tmp_path / "x.mp3"
    src.write_bytes(b"not really audio")
    if _shutil.which("ffmpeg") is None:
        assert convert_to_wav(str(src), str(tmp_path / "x.wav")) is None
    else:
        with pytest.raises(RuntimeError):  # garbage input -> ffmpeg error
            convert_to_wav(str(src), str(tmp_path / "x.wav"))

    # artifact cleanup removes original + converted sibling
    up = tmp_path / "uploads"
    up.mkdir()
    (up / "abc_y.mp3").write_bytes(b"a")
    (up / "abc_y.wav").write_bytes(b"b")
    assert delete_upload_artifacts(str(up), "abc_y.mp3") == 2
    assert not os.listdir(up)

    # delete endpoint uses it end-to-end
    base, state = service
    H = _session(base)
    fid = _upload_wav(base, H, name="todelete.wav")
    stored = state.db.get_file(fid)["stored_filename"]
    assert os.path.exists(os.path.join(state.upload_dir, stored))
    status, _ = _req(base, f"/api/user/files/{fid}", "DELETE", headers=H)
    assert status == 200
    assert not os.path.exists(os.path.join(state.upload_dir, stored))


def test_session_reuse_and_max_sessions_eviction(service):
    """POST /api/session returns the existing session when the header names
    a live one; at the max_sessions cap the longest-idle disconnected
    anonymous session is evicted, and 503 when nothing is evictable
    (reference server.py:651-696)."""
    base, state = service
    _, s = _req(base, "/api/session", "POST")
    # reuse: same id comes back
    _, again = _req(base, "/api/session", "POST",
                    headers={"X-Session-Id": s["session_id"]})
    assert again["session_id"] == s["session_id"]

    state.config.set("max_sessions", state.db.get_active_session_count())
    try:
        # cap reached -> oldest idle anonymous session is evicted
        status, s2 = _req(base, "/api/session", "POST")
        assert status == 200
        # cap reached and NO evictable session (all killed but this one
        # is... make every anonymous session "connected")
        with state._ws_lock:
            saved = list(state._ws_clients)
            state._ws_clients = [
                (row["id"], None) for row in state.db.get_all_sessions()]
        try:
            status, r = _req(base, "/api/session", "POST")
            assert status == 503
        finally:
            with state._ws_lock:
                state._ws_clients = saved
    finally:
        state.config.set("max_sessions", 100)


def _ws_connect(base, sid):
    import base64
    import socket

    host, port = base.replace("http://", "").split(":")
    sock = socket.create_connection((host, int(port)), timeout=30)
    key = base64.b64encode(b"0123456789abcdef").decode()
    sock.sendall((f"GET /ws HTTP/1.1\r\nHost: {host}\r\n"
                  "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                  f"Sec-WebSocket-Key: {key}\r\n"
                  f"X-Session-Id: {sid}\r\n"
                  "Sec-WebSocket-Version: 13\r\n\r\n").encode())
    buf = b""
    while b"\r\n\r\n" not in buf:   # byte-wise: don't swallow frames
        buf += sock.recv(1)
    assert b"101" in buf.split(b"\r\n", 1)[0]
    return sock


def _ws_send_text(sock, obj):
    payload = json.dumps(obj).encode()
    head = bytes([0x81])
    assert len(payload) < 126
    sock.sendall(head + bytes([len(payload)]) + payload)


def _ws_recv(sock, timeout=10.0):
    import struct

    sock.settimeout(timeout)
    head = sock.recv(2)
    if len(head) < 2:
        return None, None
    opcode = head[0] & 0x0F
    ln = head[1] & 0x7F
    if ln == 126:
        ln = struct.unpack(">H", sock.recv(2))[0]
    payload = b""
    while len(payload) < ln:
        payload += sock.recv(ln - len(payload))
    return opcode, payload


def test_ws_session_validation_and_messages(service):
    """/ws closes invalid sessions with 4001; 'heartbeat' gets
    heartbeat_ack; 'subscribe_queue' answers an immediate queue_position,
    -1 for files the session may not access."""
    import struct

    base, state = service
    # invalid session -> close frame, code 4001
    sock = _ws_connect(base, "not-a-session")
    opcode, payload = _ws_recv(sock)
    assert opcode == 0x8
    assert struct.unpack(">H", payload[:2])[0] == 4001
    sock.close()

    H = _session(base)
    sid = H["X-Session-Id"]
    fid = _upload_wav(base, H)
    other = _session(base)
    other_fid = _upload_wav(base, other, name="other.wav")

    sock = _ws_connect(base, sid)
    _ws_send_text(sock, {"type": "heartbeat"})
    opcode, payload = _ws_recv(sock)
    assert json.loads(payload) == {"type": "heartbeat_ack"}

    _ws_send_text(sock, {"type": "subscribe_queue", "file_id": fid})
    _, payload = _ws_recv(sock)
    msg = json.loads(payload)
    assert msg["type"] == "queue_position" and msg["file_id"] == fid
    assert msg["position"] >= 0

    # someone else's file -> position -1
    _ws_send_text(sock, {"type": "subscribe_queue", "file_id": other_fid})
    _, payload = _ws_recv(sock)
    assert json.loads(payload)["position"] == -1

    # bogus id -> -1 too
    _ws_send_text(sock, {"type": "subscribe_queue", "file_id": "zzz"})
    _, payload = _ws_recv(sock)
    assert json.loads(payload)["position"] == -1

    assert state.ws_connected(sid)
    sock.close()
    for _ in range(100):
        if not state.ws_connected(sid):
            break
        time.sleep(0.05)
    assert not state.ws_connected(sid)  # unregistered on disconnect
