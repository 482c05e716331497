# HTTP API server — stdlib ThreadingHTTPServer implementation of the
# reference web service's endpoint surface.
#
# Endpoint behavior mirrors reference web_service/server.py: anonymous
# sessions + JWT login, login rate limiting/lockout, upload -> process ->
# status/result flow over the strict-FIFO queue, speaker rename, user file
# listing, meetings CRUD, admin queue/users/stats, and a WebSocket (/ws)
# progress push (minimal RFC6455 server — FastAPI/uvicorn are not available
# in this environment; clients can also poll /api/files/{id}/status exactly
# like the reference's polling fallback).

from __future__ import annotations

import base64
import hashlib
import json
import os
import re
import struct
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from sherpa_vietnamese_asr_tpu.web_service.auth import (
    JwtAuth,
    RateLimiter,
    hash_password,
    verify_password,
)
from sherpa_vietnamese_asr_tpu.web_service.database import Database
from sherpa_vietnamese_asr_tpu.web_service.queue_manager import QueueManager

MAX_UPLOAD_BYTES = 2 * 1024 * 1024 * 1024  # 2 GB like the reference
MAX_JSON_BYTES = 1 * 1024 * 1024
_WS_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

SECURITY_HEADERS = {
    "X-Content-Type-Options": "nosniff",
    "X-Frame-Options": "DENY",
    "Referrer-Policy": "same-origin",
}


class ApiError(Exception):
    def __init__(self, status, message):
        super().__init__(message)
        self.status = status
        self.message = message


class AppState:
    """Shared server state: db, auth, queue, websocket subscribers."""

    def __init__(self, db=None, model_provider=None, upload_dir=None,
                 pipeline_factory=None, data_dir=None):
        data_dir = data_dir or os.path.join(os.getcwd(), "web_data")
        os.makedirs(data_dir, exist_ok=True)
        self.upload_dir = upload_dir or os.path.join(data_dir, "uploads")
        os.makedirs(self.upload_dir, exist_ok=True)
        self.db = db or Database(os.path.join(data_dir, "asr.db"))
        self.auth = JwtAuth(os.path.join(data_dir, "jwt.secret"))
        self.login_limiter = RateLimiter()
        self.account_limiter = RateLimiter()
        self.queue = QueueManager(self.db, model_provider or (lambda n: None),
                                  self.upload_dir,
                                  pipeline_factory=pipeline_factory)
        self._ws_clients = []  # (session_id, socket)
        self._ws_lock = threading.Lock()
        self._model_provider = model_provider
        self._streamer = None          # lazy MultiStreamRecognizer
        self._streamer_lock = threading.Lock()
        self.queue.subscribe(self._push_event)
        # default admin account (reference seeds one on first run)
        if not self.db.get_user_by_username("admin"):
            self.db.create_user("admin", hash_password("admin"), role="admin")
        self._gc_stop = threading.Event()
        self._gc_thread = threading.Thread(target=self._session_gc_loop,
                                           daemon=True)
        self._gc_thread.start()

    def _session_gc_loop(self, interval_sec=60, timeout_minutes=30):
        """Expire stale anonymous sessions (reference session_manager's
        heartbeat GC)."""
        while not self._gc_stop.wait(interval_sec):
            try:
                for sess in self.db.get_expired_anonymous_sessions(
                        timeout_minutes):
                    self.db.expire_session(sess["id"])
            except Exception:
                pass

    def shutdown(self):
        self._gc_stop.set()

    # -- live streaming (shared batched recognizer) -------------------------
    def get_streamer(self, n_streams=8):
        with self._streamer_lock:
            if self._streamer is None:
                from sherpa_vietnamese_asr_tpu.pipeline.streaming_online \
                    import MultiStreamRecognizer
                model = self._model_provider(None) if self._model_provider \
                    else None
                if model is None:
                    from sherpa_vietnamese_asr_tpu.models.registry import (
                        random_asr_model,
                    )
                    model = random_asr_model(vocab_size=2000, beam_size=4)
                self._streamer = MultiStreamRecognizer(model,
                                                       n_streams=n_streams)
            return self._streamer

    # -- websocket push ---------------------------------------------------------
    def add_ws_client(self, session_id, sock):
        with self._ws_lock:
            self._ws_clients.append((session_id, sock))

    def _push_event(self, event):
        data = json.dumps(event, ensure_ascii=False).encode()
        frame = _ws_frame(data)
        dead = []
        with self._ws_lock:
            clients = list(self._ws_clients)
        for sid, sock in clients:
            try:
                sock.sendall(frame)
            except OSError:
                dead.append((sid, sock))
        if dead:
            with self._ws_lock:
                self._ws_clients = [c for c in self._ws_clients
                                    if c not in dead]


def _ws_frame(payload: bytes, opcode=0x1) -> bytes:
    n = len(payload)
    head = bytes([0x80 | opcode])
    if n < 126:
        head += bytes([n])
    elif n < 65536:
        head += bytes([126]) + struct.pack(">H", n)
    else:
        head += bytes([127]) + struct.pack(">Q", n)
    return head + payload


class Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    state: AppState = None  # injected by make_server

    # -- helpers ------------------------------------------------------------
    def log_message(self, fmt, *args):  # quiet
        pass

    def _send_json(self, obj, status=200):
        body = json.dumps(obj, ensure_ascii=False).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        for k, v in SECURITY_HEADERS.items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _read_json(self):
        length = int(self.headers.get("Content-Length") or 0)
        if length > MAX_JSON_BYTES:
            raise ApiError(413, "Request body too large")
        if length == 0:
            return {}
        try:
            return json.loads(self.rfile.read(length).decode("utf-8"))
        except (ValueError, UnicodeDecodeError):
            raise ApiError(400, "Invalid JSON body")

    def _session_id(self):
        return self.headers.get("X-Session-Id") or ""

    def _client_ip(self):
        return self.client_address[0]

    def _current_user(self):
        authz = self.headers.get("Authorization") or ""
        if not authz.startswith("Bearer "):
            return None
        payload = self.state.auth.verify_token(authz[7:])
        if not payload:
            return None
        return self.state.db.get_user_by_id(payload.get("user_id"))

    def _require_auth(self):
        user = self._current_user()
        if user is None or not user.get("is_active", 1):
            raise ApiError(401, "Authentication required")
        return user

    def _require_admin(self):
        user = self._require_auth()
        if user.get("role") != "admin":
            raise ApiError(403, "Admin access required")
        return user

    def _check_file_access(self, file_rec):
        if file_rec is None:
            raise ApiError(404, "File not found")
        user = self._current_user()
        if user and (user["id"] == file_rec.get("user_id")
                     or user.get("role") == "admin"):
            return
        if file_rec.get("session_id") == self._session_id() \
                and self._session_id():
            return
        raise ApiError(403, "Access denied")

    # -- routing ---------------------------------------------------------------
    def do_GET(self):
        self._route("GET")

    def do_POST(self):
        self._route("POST")

    def do_PUT(self):
        self._route("PUT")

    def do_DELETE(self):
        self._route("DELETE")

    def _route(self, method):
        path = self.path.split("?")[0]
        try:
            for pattern, meth, fn in ROUTES:
                if meth != method:
                    continue
                m = re.fullmatch(pattern, path)
                if m:
                    fn(self, *m.groups())
                    return
            raise ApiError(404, "Not found")
        except ApiError as e:
            self._send_json({"detail": e.message}, e.status)
        except BrokenPipeError:
            pass
        except Exception as e:
            self._send_json({"detail": f"Internal error: {e}"}, 500)

    # -- endpoints ----------------------------------------------------------------
    def ep_version(self):
        from sherpa_vietnamese_asr_tpu import __version__

        self._send_json({"version": __version__, "backend": "jax-tpu"})

    def ep_models(self):
        from sherpa_vietnamese_asr_tpu.utils.config import MODEL_DOWNLOAD_INFO

        self._send_json({
            "models": [{"id": k, "name": v["name"],
                        "description": v["description"]}
                       for k, v in MODEL_DOWNLOAD_INFO.items()]
            + [{"id": "rover-voting", "name": "ROVER (30M+68M)",
                "description": "Dual-model fusion"}],
        })

    def ep_defaults(self):
        self._send_json({
            "default_asr_model": self.state.queue.default_model,
            "default_punctuation_confidence": 5,
            "default_case_confidence": 5,
            "default_speaker_model": "pure_ort",
        })

    def ep_create_session(self):
        sid = uuid.uuid4().hex
        self.state.db.create_session(
            sid, ip_address=self._client_ip(),
            user_agent=self.headers.get("User-Agent", ""))
        self._send_json({"session_id": sid})

    def ep_get_session(self):
        sess = self.state.db.get_session(self._session_id())
        if not sess:
            raise ApiError(404, "Session not found")
        self._send_json({"session": sess})

    def ep_heartbeat(self):
        self.state.db.update_heartbeat(self._session_id())
        self._send_json({"ok": True})

    def ep_login(self):
        ip = self._client_ip()
        if self.state.login_limiter.is_locked(ip):
            raise ApiError(429, "Too many failed logins; try again later")
        body = self._read_json()
        username = str(body.get("username", ""))[:64]
        password = str(body.get("password", ""))[:256]
        if self.state.account_limiter.is_locked(username):
            raise ApiError(429, "Account temporarily locked")
        user = self.state.db.get_user_by_username(username)
        if not user or not verify_password(password, user["password_hash"]) \
                or not user.get("is_active", 1):
            self.state.login_limiter.record_failure(ip)
            self.state.account_limiter.record_failure(username)
            raise ApiError(401, "Invalid credentials")
        self.state.login_limiter.clear(ip)
        self.state.account_limiter.clear(username)
        token = self.state.auth.create_token(
            {"user_id": user["id"], "role": user["role"]})
        if self._session_id():
            self.state.db.link_session_to_user(self._session_id(),
                                               user["id"])
        self._send_json({"token": token, "user": {
            "id": user["id"], "username": user["username"],
            "role": user["role"]}})

    def ep_me(self):
        user = self._require_auth()
        self._send_json({"user": {"id": user["id"],
                                  "username": user["username"],
                                  "role": user["role"]}})

    def ep_logout(self):
        authz = self.headers.get("Authorization") or ""
        if authz.startswith("Bearer "):
            self.state.auth.revoke_token(authz[7:])
        self._send_json({"ok": True})

    def ep_change_password(self):
        user = self._require_auth()
        body = self._read_json()
        if not verify_password(str(body.get("old_password", "")),
                               user["password_hash"]):
            raise ApiError(401, "Wrong password")
        new = str(body.get("new_password", ""))
        if len(new) < 4:
            raise ApiError(400, "Password too short")
        self.state.db.update_user(user["id"],
                                  password_hash=hash_password(new))
        self._send_json({"ok": True})

    def ep_upload(self):
        sid = self._session_id()
        if not sid or not self.state.db.get_session(sid):
            raise ApiError(401, "Valid session required")
        length = int(self.headers.get("Content-Length") or 0)
        if length <= 0:
            raise ApiError(400, "Empty upload")
        if length > MAX_UPLOAD_BYTES:
            raise ApiError(413, "File too large")
        filename = os.path.basename(
            self.headers.get("X-Filename") or "upload.wav")
        if not re.fullmatch(r"[\w .()\[\]-]{1,255}", filename):
            raise ApiError(400, "Invalid filename")
        stored = f"{uuid.uuid4().hex}_{filename}"
        dest = os.path.join(self.state.upload_dir, stored)
        remaining = length
        with open(dest, "wb") as f:
            while remaining > 0:
                chunk = self.rfile.read(min(65536, remaining))
                if not chunk:
                    break
                f.write(chunk)
                remaining -= len(chunk)
        user = self._current_user()
        file_id = self.state.db.create_file(
            sid, filename, stored, file_size_bytes=length,
            user_id=user["id"] if user else None)
        self._send_json({"file_id": file_id, "filename": filename})

    def ep_process(self, file_id):
        file_id = int(file_id)
        rec = self.state.db.get_file(file_id)
        self._check_file_access(rec)
        if rec["status"] in ("queued", "processing"):
            raise ApiError(409, "Already queued")
        config = self._read_json()
        position = self.state.queue.add_to_queue(
            file_id, rec["session_id"], config)
        self._send_json({"ok": True, "queue_position": position})

    def ep_cancel(self, file_id):
        file_id = int(file_id)
        self._check_file_access(self.state.db.get_file(file_id))
        ok = self.state.queue.cancel(file_id)
        self._send_json({"ok": ok})

    def ep_status(self, file_id):
        file_id = int(file_id)
        rec = self.state.db.get_file(file_id)
        self._check_file_access(rec)
        item = self.state.db.get_queue_item(file_id) or {}
        self._send_json({
            "status": rec["status"],
            "progress_percent": item.get("progress_percent", 0),
            "progress_message": item.get("progress_message", ""),
            "queue_position": self.state.db.get_queue_position(file_id),
        })

    def ep_result(self, file_id):
        file_id = int(file_id)
        rec = self.state.db.get_file(file_id)
        self._check_file_access(rec)
        if rec["status"] != "completed" or not rec.get("asr_result_json"):
            raise ApiError(409, f"Not completed (status={rec['status']})")
        self._send_json({"result": json.loads(rec["asr_result_json"]),
                         "speaker_names": json.loads(
                             rec.get("speaker_names_json") or "{}")})

    def ep_rename_speakers(self, file_id):
        file_id = int(file_id)
        rec = self.state.db.get_file(file_id)
        self._check_file_access(rec)
        body = self._read_json()
        names = body.get("speaker_names", {})
        if not isinstance(names, dict):
            raise ApiError(400, "speaker_names must be a mapping")
        self.state.db.update_file(
            file_id, speaker_names_json=json.dumps(names,
                                                   ensure_ascii=False))
        self._send_json({"ok": True})

    def ep_split_speaker(self, file_id):
        """Split a speaker at a text segment (reference server.py:1325-1422):
        inserts a speaker separator before the target segment, with scope
        'single' restoring the original speaker afterwards."""
        import html as _html

        file_id = int(file_id)
        rec = self.state.db.get_file(file_id)
        self._check_file_access(rec)
        body = self._read_json()
        seg_index = body.get("seg_index")
        new_speaker = _html.escape(
            str(body.get("new_speaker", "")).strip()[:200], quote=False)
        scope = body.get("scope", "to_end")
        if seg_index is None or not rec.get("asr_result_json"):
            raise ApiError(400, "Invalid request")
        data = json.loads(rec["asr_result_json"])
        segments = data.get("segments", [])
        speaker_names = data.get("speaker_names", {})

        max_id = max([s.get("speaker_id", 0) for s in segments
                      if s.get("type") == "speaker"] + [-1])
        new_id = None
        for sid, name in speaker_names.items():
            if name == new_speaker:
                new_id = int(sid)
                break
        if new_id is None:
            new_id = max_id + 1
            speaker_names[str(new_id)] = new_speaker

        text_idx = 0
        target_pos = None
        current_sep = None
        for i, seg in enumerate(segments):
            if seg.get("type") == "speaker":
                current_sep = seg
            elif seg.get("type") == "text":
                if text_idx == int(seg_index):
                    target_pos = i
                    break
                text_idx += 1
        if target_pos is not None:
            segments.insert(target_pos, {
                "type": "speaker", "speaker": new_speaker,
                "speaker_id": new_id,
                "start_time": segments[target_pos + 1].get("start_time", 0)
                if target_pos + 1 < len(segments) else 0,
            })
            if scope == "single" and current_sep:
                restore_pos = target_pos + 2
                restore_time = (segments[restore_pos].get("start_time", 0)
                                if restore_pos < len(segments) else 0)
                segments.insert(restore_pos, {
                    "type": "speaker",
                    "speaker": current_sep.get("speaker", ""),
                    "speaker_id": current_sep.get("speaker_id", 0),
                    "start_time": restore_time,
                })
        data["segments"] = segments
        data["speaker_names"] = speaker_names
        self.state.db.update_file(
            file_id,
            asr_result_json=json.dumps(data, ensure_ascii=False),
            speaker_names_json=json.dumps(speaker_names, ensure_ascii=False))
        self._send_json({"success": True, "result": data})

    def ep_merge_speaker(self, file_id):
        """Merge a speaker block up/down, optionally partially at seg_index
        (reference server.py:1424-1535)."""
        file_id = int(file_id)
        rec = self.state.db.get_file(file_id)
        self._check_file_access(rec)
        body = self._read_json()
        block_index = body.get("block_index")
        direction = body.get("direction", "up")
        seg_index = body.get("seg_index")
        if block_index is None or not rec.get("asr_result_json"):
            raise ApiError(400, "Invalid request")
        data = json.loads(rec["asr_result_json"])
        segments = data.get("segments", [])
        sep_idx = [i for i, s in enumerate(segments)
                   if s.get("type") == "speaker"]
        block_index = int(block_index)
        if block_index < 0 or block_index >= len(sep_idx):
            raise ApiError(400, "Invalid block index")
        cur_i = sep_idx[block_index]
        cur_sep = segments[cur_i]

        actual = None
        if seg_index is not None:
            count = 0
            for i, s in enumerate(segments):
                if s.get("type") == "text":
                    if count == int(seg_index):
                        actual = i
                        break
                    count += 1
        next_i = (sep_idx[block_index + 1]
                  if block_index + 1 < len(sep_idx) else len(segments))
        block_texts = [i for i in range(cur_i + 1, next_i)
                       if segments[i].get("type") == "text"]

        if direction == "up" and block_index > 0:
            last = (actual is None or not block_texts
                    or actual >= block_texts[-1])
            segments.pop(cur_i)
            if not last:
                insert_pos = actual  # actual shifted -1 by pop, +1 to insert after
                restore_time = (segments[insert_pos].get("start_time", 0)
                                if insert_pos < len(segments) else 0)
                segments.insert(insert_pos, {
                    "type": "speaker",
                    "speaker": cur_sep.get("speaker", ""),
                    "speaker_id": cur_sep.get("speaker_id", 0),
                    "start_time": restore_time,
                })
        elif direction == "down" and block_index < len(sep_idx) - 1:
            nxt_i = sep_idx[block_index + 1]
            nxt_sep = segments[nxt_i]
            first = (actual is None or not block_texts
                     or actual <= block_texts[0])
            segments.pop(nxt_i)
            if not first:
                segments.insert(actual, {
                    "type": "speaker",
                    "speaker": nxt_sep.get("speaker", ""),
                    "speaker_id": nxt_sep.get("speaker_id", 0),
                    "start_time": segments[actual].get("start_time", 0)
                    if actual < len(segments) else 0,
                })
        data["segments"] = segments
        self.state.db.update_file(
            file_id, asr_result_json=json.dumps(data, ensure_ascii=False))
        self._send_json({"success": True, "result": data})

    def ep_user_files(self):
        user = self._require_auth()
        self._send_json({"files": [
            {k: f[k] for k in ("id", "original_filename", "status",
                               "duration_sec", "created_at")}
            for f in self.state.db.get_user_files(user["id"])]})

    def ep_delete_file(self, file_id):
        file_id = int(file_id)
        rec = self.state.db.get_file(file_id)
        self._check_file_access(rec)
        path = os.path.join(self.state.upload_dir, rec["stored_filename"])
        if os.path.exists(path):
            os.remove(path)
        self.state.db.delete_file(file_id)
        self.state.db.remove_from_queue(file_id)
        self._send_json({"ok": True})

    def ep_meetings(self):
        user = self._require_auth()
        self._send_json(
            {"meetings": self.state.db.get_user_meetings(user["id"])})

    def ep_meeting(self, meeting_id):
        user = self._require_auth()
        m = self.state.db.get_meeting(int(meeting_id))
        if not m or (m["user_id"] != user["id"]
                     and user.get("role") != "admin"):
            raise ApiError(404, "Meeting not found")
        self._send_json({"meeting": m})

    def ep_update_meeting(self, meeting_id):
        user = self._require_auth()
        m = self.state.db.get_meeting(int(meeting_id))
        if not m or m["user_id"] != user["id"]:
            raise ApiError(404, "Meeting not found")
        body = self._read_json()
        updates = {k: body[k] for k in ("meeting_name", "asr_result_json")
                   if k in body}
        self.state.db.update_meeting(int(meeting_id), **updates)
        self._send_json({"ok": True})

    def ep_delete_meeting(self, meeting_id):
        user = self._require_auth()
        m = self.state.db.get_meeting(int(meeting_id))
        if not m or m["user_id"] != user["id"]:
            raise ApiError(404, "Meeting not found")
        self.state.db.delete_meeting(int(meeting_id))
        self._send_json({"ok": True})

    def ep_stats(self):
        self._require_admin()
        self._send_json({"stats": self.state.db.get_stats()})

    def ep_queue_state(self):
        self._require_admin()
        self._send_json({"queue": self.state.db.get_waiting_queue(),
                         "paused": self.state.queue.paused,
                         "current": self.state.queue.current_file_id})

    def ep_queue_pause(self):
        self._require_admin()
        self.state.queue.pause()
        self._send_json({"ok": True})

    def ep_queue_resume(self):
        self._require_admin()
        self.state.queue.resume()
        self._send_json({"ok": True})

    def ep_queue_cancel(self, file_id):
        self._require_admin()
        self._send_json({"ok": self.state.queue.cancel(int(file_id))})

    def ep_admin_users(self):
        self._require_admin()
        users = [{k: u[k] for k in ("id", "username", "role", "is_active",
                                    "storage_limit_gb", "created_at")}
                 for u in self.state.db.get_all_users()]
        self._send_json({"users": users})

    def ep_admin_create_user(self):
        self._require_admin()
        body = self._read_json()
        username = str(body.get("username", ""))[:64]
        password = str(body.get("password", ""))
        if not re.fullmatch(r"[\w.-]{3,64}", username):
            raise ApiError(400, "Invalid username")
        if len(password) < 4:
            raise ApiError(400, "Password too short")
        if self.state.db.get_user_by_username(username):
            raise ApiError(409, "User exists")
        uid = self.state.db.create_user(
            username, hash_password(password),
            role=body.get("role", "user"))
        self._send_json({"ok": True, "user_id": uid})

    def ep_admin_delete_user(self, user_id):
        admin = self._require_admin()
        if int(user_id) == admin["id"]:
            raise ApiError(400, "Cannot delete yourself")
        self.state.db.delete_user(int(user_id))
        self._send_json({"ok": True})

    def ep_rate_limits(self):
        self._require_admin()
        self._send_json({"locked_ips": self.state.login_limiter.locked_keys(),
                         "locked_accounts":
                             self.state.account_limiter.locked_keys()})

    def ep_rate_limits_clear(self):
        self._require_admin()
        self.state.login_limiter.clear()
        self.state.account_limiter.clear()
        self._send_json({"ok": True})

    def ep_summarize(self, file_id):
        file_id = int(file_id)
        rec = self.state.db.get_file(file_id)
        self._check_file_access(rec)
        if rec["status"] != "completed" or not rec.get("asr_result_json"):
            raise ApiError(409, "Transcription not completed")
        from sherpa_vietnamese_asr_tpu.web_service.summarizer import Summarizer

        data = json.loads(rec["asr_result_json"])
        text = data.get("text") or " ".join(
            s.get("text", "") for s in data.get("segments", [])
            if s.get("type") == "text")
        summary = Summarizer().summarize(text)
        self.state.db.update_file(
            file_id, summary_json=json.dumps(summary, ensure_ascii=False))
        self._send_json({"summary": summary})

    def ep_get_summary(self, file_id):
        file_id = int(file_id)
        rec = self.state.db.get_file(file_id)
        self._check_file_access(rec)
        if not rec.get("summary_json"):
            raise ApiError(404, "No summary")
        self._send_json({"summary": json.loads(rec["summary_json"])})

    def ep_summarizer_status(self):
        from sherpa_vietnamese_asr_tpu.web_service.summarizer import Summarizer

        self._send_json(Summarizer().status())

    # -- websocket ---------------------------------------------------------------
    def ep_websocket(self):
        key = self.headers.get("Sec-WebSocket-Key")
        if not key or self.headers.get("Upgrade", "").lower() != "websocket":
            raise ApiError(400, "WebSocket upgrade required")
        accept = base64.b64encode(hashlib.sha1(
            (key + _WS_MAGIC).encode()).digest()).decode()
        self.send_response(101, "Switching Protocols")
        self.send_header("Upgrade", "websocket")
        self.send_header("Connection", "Upgrade")
        self.send_header("Sec-WebSocket-Accept", accept)
        self.end_headers()
        self.close_connection = True
        self.state.add_ws_client(self._session_id(), self.connection)
        # Keep the socket open; events are pushed by AppState._push_event.
        # Read (and discard) client frames until close.
        try:
            sock = self.connection
            sock.settimeout(300)
            while True:
                head = sock.recv(2)
                if len(head) < 2:
                    break
                opcode = head[0] & 0x0F
                ln = head[1] & 0x7F
                masked = head[1] & 0x80
                if ln == 126:
                    ln = struct.unpack(">H", sock.recv(2))[0]
                elif ln == 127:
                    ln = struct.unpack(">Q", sock.recv(8))[0]
                mask = sock.recv(4) if masked else b"\0" * 4
                _payload = sock.recv(ln) if ln else b""
                if opcode == 0x8:  # close
                    break
                if opcode == 0x9:  # ping -> pong
                    sock.sendall(_ws_frame(b"", opcode=0xA))
        except OSError:
            pass


    def _ws_handshake(self):
        key = self.headers.get("Sec-WebSocket-Key")
        if not key or self.headers.get("Upgrade", "").lower() != "websocket":
            raise ApiError(400, "WebSocket upgrade required")
        accept = base64.b64encode(hashlib.sha1(
            (key + _WS_MAGIC).encode()).digest()).decode()
        self.send_response(101, "Switching Protocols")
        self.send_header("Upgrade", "websocket")
        self.send_header("Connection", "Upgrade")
        self.send_header("Sec-WebSocket-Accept", accept)
        self.end_headers()
        self.close_connection = True

    @staticmethod
    def _ws_read_frame(sock):
        """Read one frame; returns (opcode, payload) or (None, None) on
        EOF. Client->server payloads are unmasked per RFC 6455."""
        def recv_exact(n):
            buf = b""
            while len(buf) < n:
                part = sock.recv(n - len(buf))
                if not part:
                    return None
                buf += part
            return buf

        head = recv_exact(2)
        if head is None:
            return None, None
        opcode = head[0] & 0x0F
        ln = head[1] & 0x7F
        masked = head[1] & 0x80
        if ln == 126:
            ln = struct.unpack(">H", recv_exact(2))[0]
        elif ln == 127:
            ln = struct.unpack(">Q", recv_exact(8))[0]
        mask = recv_exact(4) if masked else None
        payload = recv_exact(ln) if ln else b""
        if payload is None:
            return None, None
        if mask:
            payload = bytes(b ^ mask[i % 4]
                            for i, b in enumerate(payload))
        return opcode, payload

    def ep_ws_stream(self):
        """Live transcription: client streams binary PCM16 mono 16 kHz
        frames; the server replies with JSON partials after each decoded
        chunk and a final on close. One slot of the shared batched
        recognizer per connection (reference's live mode is the desktop
        tab, streaming_asr_online.py; this is the server-side analogue)."""
        import numpy as np

        streamer = self.state.get_streamer()
        self._ws_handshake()
        sock = self.connection
        sock.settimeout(300)
        with self.state._streamer_lock:
            slot = streamer.open_stream()
        if slot is None:
            sock.sendall(_ws_frame(json.dumps(
                {"type": "error", "message": "all stream slots busy"}
            ).encode()))
            return
        sock.sendall(_ws_frame(json.dumps(
            {"type": "ready", "slot": slot}).encode()))
        try:
            while True:
                opcode, payload = self._ws_read_frame(sock)
                if opcode is None or opcode == 0x8:   # EOF / close
                    break
                if opcode == 0x9:                      # ping -> pong
                    sock.sendall(_ws_frame(payload, opcode=0xA))
                    continue
                if opcode == 0x2 and payload:          # binary PCM16
                    audio = np.frombuffer(payload, np.int16
                                          ).astype(np.float32) / 32768.0
                    emitted = False
                    with self.state._streamer_lock:
                        streamer.accept_waveform(slot, audio)
                        while slot in streamer.ready_slots():
                            out = streamer.step()
                            emitted = emitted or bool(out.get(slot))
                        text = streamer.get_result(slot)
                    if emitted:
                        sock.sendall(_ws_frame(json.dumps(
                            {"type": "partial", "text": text},
                            ensure_ascii=False).encode()))
        except OSError:
            pass
        finally:
            with self.state._streamer_lock:
                final = streamer.close_stream(slot)
            try:
                sock.sendall(_ws_frame(json.dumps(
                    {"type": "final", "text": final},
                    ensure_ascii=False).encode()))
            except OSError:
                pass


ROUTES = [
    (r"/api/version", "GET", Handler.ep_version),
    (r"/api/config/models", "GET", Handler.ep_models),
    (r"/api/config/defaults", "GET", Handler.ep_defaults),
    (r"/api/session", "POST", Handler.ep_create_session),
    (r"/api/session", "GET", Handler.ep_get_session),
    (r"/api/session/heartbeat", "POST", Handler.ep_heartbeat),
    (r"/api/auth/login", "POST", Handler.ep_login),
    (r"/api/auth/me", "GET", Handler.ep_me),
    (r"/api/auth/logout", "POST", Handler.ep_logout),
    (r"/api/auth/change-password", "POST", Handler.ep_change_password),
    (r"/api/upload", "POST", Handler.ep_upload),
    (r"/api/process/(\d+)", "POST", Handler.ep_process),
    (r"/api/cancel/(\d+)", "POST", Handler.ep_cancel),
    (r"/api/files/(\d+)/status", "GET", Handler.ep_status),
    (r"/api/files/(\d+)/result", "GET", Handler.ep_result),
    (r"/api/files/(\d+)/speakers", "POST", Handler.ep_rename_speakers),
    (r"/api/files/(\d+)/split-speaker", "POST", Handler.ep_split_speaker),
    (r"/api/files/(\d+)/merge-speaker", "POST", Handler.ep_merge_speaker),
    (r"/api/files/(\d+)/summarize", "POST", Handler.ep_summarize),
    (r"/api/files/(\d+)/summary", "GET", Handler.ep_get_summary),
    (r"/api/summarizer/status", "GET", Handler.ep_summarizer_status),
    (r"/api/user/files", "GET", Handler.ep_user_files),
    (r"/api/user/files/(\d+)", "DELETE", Handler.ep_delete_file),
    (r"/api/meetings", "GET", Handler.ep_meetings),
    (r"/api/meetings/(\d+)", "GET", Handler.ep_meeting),
    (r"/api/meetings/(\d+)", "PUT", Handler.ep_update_meeting),
    (r"/api/meetings/(\d+)", "DELETE", Handler.ep_delete_meeting),
    (r"/api/admin/stats", "GET", Handler.ep_stats),
    (r"/api/admin/queue", "GET", Handler.ep_queue_state),
    (r"/api/admin/queue/pause", "POST", Handler.ep_queue_pause),
    (r"/api/admin/queue/resume", "POST", Handler.ep_queue_resume),
    (r"/api/admin/queue/cancel/(\d+)", "POST", Handler.ep_queue_cancel),
    (r"/api/admin/users", "GET", Handler.ep_admin_users),
    (r"/api/admin/users", "POST", Handler.ep_admin_create_user),
    (r"/api/admin/users/(\d+)", "DELETE", Handler.ep_admin_delete_user),
    (r"/api/admin/rate-limits", "GET", Handler.ep_rate_limits),
    (r"/api/admin/rate-limits/clear", "POST", Handler.ep_rate_limits_clear),
    (r"/ws", "GET", Handler.ep_websocket),
    (r"/ws/stream", "GET", Handler.ep_ws_stream),
]


def make_server(host="127.0.0.1", port=0, **state_kwargs):
    """Create (server, state). Serve with server.serve_forever()."""
    state = AppState(**state_kwargs)

    class BoundHandler(Handler):
        pass

    BoundHandler.state = state
    server = ThreadingHTTPServer((host, port), BoundHandler)
    return server, state
