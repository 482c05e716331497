# Speaker split/merge endpoint behavior (reference server.py:1325-1535).
import json
import threading
import urllib.request
import urllib.error

import pytest


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from sherpa_vietnamese_asr_tpu.web_service.server import make_server

    server, state = make_server(data_dir=str(tmp_path_factory.mktemp("wd")))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}", state
    server.shutdown()


def _req(base, path, method="GET", body=None, headers=None):
    headers = dict(headers or {})
    data = None
    if body is not None:
        data = json.dumps(body).encode()
        headers["Content-Type"] = "application/json"
    req = urllib.request.Request(base + path, data=data, method=method,
                                 headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def _seed_file(state, sid):
    segments = [
        {"type": "speaker", "speaker": "Người nói 1", "speaker_id": 0,
         "start_time": 0.0},
        {"type": "text", "text": "cau mot.", "start_time": 0.0,
         "segment_id": 0, "partials": []},
        {"type": "text", "text": "cau hai.", "start_time": 2.0,
         "segment_id": 1, "partials": []},
        {"type": "speaker", "speaker": "Người nói 2", "speaker_id": 1,
         "start_time": 4.0},
        {"type": "text", "text": "cau ba.", "start_time": 4.0,
         "segment_id": 2, "partials": []},
    ]
    data = {"version": 1, "segments": segments,
            "speaker_names": {"0": "Người nói 1", "1": "Người nói 2"}}
    fid = state.db.create_file(sid, "a.wav", "a.wav")
    state.db.update_file(fid, status="completed",
                         asr_result_json=json.dumps(data))
    return fid


def test_split_speaker_to_end(service):
    base, state = service
    _, s = _req(base, "/api/session", "POST")
    sid = s["session_id"]
    fid = _seed_file(state, sid)
    status, res = _req(base, f"/api/files/{fid}/split-speaker", "POST",
                       body={"seg_index": 1, "new_speaker": "Alice"},
                       headers={"X-Session-Id": sid})
    assert status == 200
    segs = res["result"]["segments"]
    kinds = [(s["type"], s.get("speaker")) for s in segs]
    # separator for Alice inserted before 'cau hai.'
    assert ("speaker", "Alice") in kinds
    alice_idx = kinds.index(("speaker", "Alice"))
    assert segs[alice_idx + 1]["text"] == "cau hai."
    assert res["result"]["speaker_names"]["2"] == "Alice"


def test_split_speaker_single_restores(service):
    base, state = service
    _, s = _req(base, "/api/session", "POST")
    sid = s["session_id"]
    fid = _seed_file(state, sid)
    status, res = _req(base, f"/api/files/{fid}/split-speaker", "POST",
                       body={"seg_index": 0, "new_speaker": "Bob",
                             "scope": "single"},
                       headers={"X-Session-Id": sid})
    segs = res["result"]["segments"]
    speakers = [s.get("speaker") for s in segs if s["type"] == "speaker"]
    # Bob separator then restore of Người nói 1
    assert speakers[:3] == ["Người nói 1", "Bob", "Người nói 1"] or \
        speakers[:2] == ["Bob", "Người nói 1"]


def test_merge_speaker_up_full_block(service):
    base, state = service
    _, s = _req(base, "/api/session", "POST")
    sid = s["session_id"]
    fid = _seed_file(state, sid)
    status, res = _req(base, f"/api/files/{fid}/merge-speaker", "POST",
                       body={"block_index": 1, "direction": "up"},
                       headers={"X-Session-Id": sid})
    assert status == 200
    segs = res["result"]["segments"]
    # only one speaker separator remains
    assert sum(1 for s in segs if s["type"] == "speaker") == 1
    assert segs[0]["speaker"] == "Người nói 1"


def test_undo_edit_restores_pre_split_state(service):
    """Undo stack (reference tab_file.py:285-360 desktop undo, persisted)."""
    base, state = service
    _, s = _req(base, "/api/session", "POST")
    sid = s["session_id"]
    fid = _seed_file(state, sid)
    hdr = {"X-Session-Id": sid}
    before = json.loads(state.db.get_file(fid)["asr_result_json"])

    _req(base, f"/api/files/{fid}/split-speaker", "POST",
         body={"seg_index": 1, "new_speaker": "Alice"}, headers=hdr)
    st, hist = _req(base, f"/api/files/{fid}/edit-history", headers=hdr)
    assert st == 200 and len(hist["history"]) == 1
    assert hist["history"][0]["op"] == "split-speaker"

    st, res = _req(base, f"/api/files/{fid}/undo-edit", "POST", headers=hdr)
    assert st == 200 and res["undone_op"] == "split-speaker"
    assert res["remaining"] == 0
    after = json.loads(state.db.get_file(fid)["asr_result_json"])
    assert after == before

    # empty stack -> 409
    st, _ = _req(base, f"/api/files/{fid}/undo-edit", "POST", headers=hdr)
    assert st == 409


def test_undo_edit_stacks_lifo_across_ops(service):
    base, state = service
    _, s = _req(base, "/api/session", "POST")
    sid = s["session_id"]
    fid = _seed_file(state, sid)
    hdr = {"X-Session-Id": sid}

    _req(base, f"/api/files/{fid}/split-speaker", "POST",
         body={"seg_index": 1, "new_speaker": "Alice"}, headers=hdr)
    mid = state.db.get_file(fid)["asr_result_json"]
    _req(base, f"/api/files/{fid}/merge-speaker", "POST",
         body={"block_index": 1, "direction": "up"}, headers=hdr)
    _, hist = _req(base, f"/api/files/{fid}/edit-history", headers=hdr)
    assert [h["op"] for h in hist["history"]] == ["merge-speaker",
                                                  "split-speaker"]
    # first undo -> back to post-split state
    _, res = _req(base, f"/api/files/{fid}/undo-edit", "POST", headers=hdr)
    assert res["undone_op"] == "merge-speaker"
    assert state.db.get_file(fid)["asr_result_json"] == mid
    # second undo -> original
    _, res = _req(base, f"/api/files/{fid}/undo-edit", "POST", headers=hdr)
    assert res["undone_op"] == "split-speaker"


def test_edit_history_depth_capped(service):
    base, state = service
    _, s = _req(base, "/api/session", "POST")
    sid = s["session_id"]
    fid = _seed_file(state, sid)
    for i in range(state.db.EDIT_HISTORY_DEPTH + 7):
        state.db.push_edit_history(fid, f"op{i}", "{}", "{}")
    hist = state.db.get_edit_history(fid)
    assert len(hist) == state.db.EDIT_HISTORY_DEPTH
    assert hist[0]["op"] == f"op{state.db.EDIT_HISTORY_DEPTH + 6}"


def test_delete_file_clears_edit_history(service):
    base, state = service
    _, s = _req(base, "/api/session", "POST")
    sid = s["session_id"]
    fid = _seed_file(state, sid)
    state.db.push_edit_history(fid, "x", "{}", "{}")
    state.db.delete_file(fid)
    assert state.db.get_edit_history(fid) == []
