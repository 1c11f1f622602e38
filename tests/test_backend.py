"""Backend tests: DB layer, services, and the full HTTP surface.

Extends the reference's 4 TestClient tests (`backend/tests/test_api.py:
10-50`) to every route group, driven over real HTTP through the stdlib
adapter (no fastapi needed in this image), plus util/unit coverage.
"""

import json
import urllib.error
import urllib.request

import pytest

from genrec_tpu.backend.api import AppContext, match_route
from genrec_tpu.backend.config import Settings
from genrec_tpu.backend.db import Database, TABLES
from genrec_tpu.backend.init_db import create_default_admin, init_db
from genrec_tpu.backend.server import BackendHTTPServer, dispatch
from genrec_tpu.backend.services import AIService, TextOrganizationService
from genrec_tpu.backend.utils import (ApiError, hash_password,
                                      success_response, verify_password)


def _ctx(llm=None, **kw):
    db = Database(":memory:")
    db.create_all()
    return AppContext(settings=Settings(), db=db, ai=AIService(llm=llm),
                      textorg=TextOrganizationService(db), **kw)


# --- db layer ---------------------------------------------------------------


def test_schema_has_all_reference_tables():
    db = Database(":memory:")
    db.create_all()
    expected = {"students", "teachers", "announcements", "knowledge_base",
                "courses", "conversation", "message", "corrective_records",
                "admin_profiles", "interest_tag", "cultivation_plan",
                "class_index", "interaction_records"}
    assert expected == set(TABLES) == set(db.table_names())


def test_conversation_messages():
    db = Database(":memory:")
    db.create_all()
    cid = db.new_conversation("S001", "hello")
    db.add_message(cid, "user", "hi")
    db.add_message(cid, "assistant", "hello!")
    msgs = db.query("SELECT role, content FROM message WHERE "
                    "conversation_id=? ORDER BY id", (cid,))
    assert [m["role"] for m in msgs] == ["user", "assistant"]


def test_init_db_idempotent(tmp_path):
    p = str(tmp_path / "app.db")
    db = init_db(p)
    assert db.count("admin_profiles") == 1
    assert db.count("students") == 2
    assert not create_default_admin(db)  # second call skips
    db.close()
    db2 = init_db(p)  # re-running never duplicates
    assert db2.count("admin_profiles") == 1
    assert db2.count("students") == 2
    db2.close()


def test_init_db_csv_seeds(tmp_path):
    ci = tmp_path / "class_index.csv"
    ci.write_text("class_id,class_name,keywords_pos,keywords_neg,content,url\n"
                  "1,algebra,math,,c1,u1\n2,poetry,art,dry,c2,u2\n")
    ir = tmp_path / "interactions.csv"
    ir.write_text("student_id,class_id,class_name,keywords_pos,keywords_neg,"
                  "preference\nS007,1,algebra,m,,like\nS007,2,poetry,a,,skip\n")
    db = init_db(str(tmp_path / "a.db"), str(ci), str(ir))
    assert db.count("class_index") == 2
    assert db.count("interaction_records") == 2
    db.close()


# --- utils -------------------------------------------------------------------


def test_password_hash_roundtrip():
    h = hash_password("secret")
    assert h.startswith("pbkdf2$") and "secret" not in h
    assert verify_password("secret", h)
    assert not verify_password("wrong", h)
    assert not verify_password("secret", "garbage")


# --- services ----------------------------------------------------------------


def test_rag_retrieves_relevant_chunk():
    ai = AIService()
    doc = ("Linear algebra studies vectors and matrices. " * 20 +
           "Cooking pasta requires boiling water. " * 20)
    ctx = ai.get_relevant_context("matrices and vectors", doc, top_k=1)
    assert "matrices" in ctx or "vectors" in ctx


def test_chunking_respects_max_size():
    chunks = AIService.split_text_into_chunks("One. Two. Three. " * 100,
                                              max_chunk_size=80)
    assert all(len(c) <= 81 for c in chunks)
    assert "".join(chunks).count("One") == 100


def test_ai_503_without_llm():
    with pytest.raises(ApiError) as e:
        AIService(llm=None).ask("hi")
    assert e.value.status_code == 503


def test_textorg_pipeline_and_404():
    c = _ctx()
    doc = c.textorg.upload("notes.txt", "txt", "First point. Second point. "
                                               "Third point. Fourth point.")
    task = c.textorg.start_processing(doc["document_id"], ["summarize"])
    res = c.textorg.results(task["task_id"])
    assert res["results"]["num_sentences"] == 4
    assert "First point" in res["results"]["summary"]
    with pytest.raises(ApiError):
        c.textorg.start_processing(999, [])
    with pytest.raises(ApiError):
        c.textorg.status(999)


# --- route table -------------------------------------------------------------


def test_match_route_path_params():
    h, p = match_route("GET", "/api/v1/ppt/status/42")
    assert p == {"task_id": "42"}
    assert match_route("GET", "/api/v1/nope") is None
    assert match_route("PATCH", "/health") is None
    # trailing-slash legacy chat route
    assert match_route("POST", "/api/v1/chat/") is not None


def test_dispatch_envelope_on_errors():
    c = _ctx()
    status, body = dispatch(c, "GET", "/missing", {}, {})
    assert status == 404 and body["success"] is False
    status, body = dispatch(c, "POST", "/api/v1/lesson-plan/generate",
                            {}, {})  # missing required fields
    assert status == 422 and body["success"] is False


# --- full HTTP surface (stdlib adapter, real sockets) ------------------------


@pytest.fixture(scope="module")
def server():
    import threading
    db = Database(":memory:")
    db.create_all()
    ctx = AppContext(settings=Settings(), db=db,
                     ai=AIService(llm=lambda msgs: "echo: " +
                                  msgs[-1]["content"][:40]),
                     textorg=TextOrganizationService(db))
    srv = BackendHTTPServer(ctx, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()


def _call(server, method, path, body=None, query=""):
    port = server.server_address[1]
    url = f"http://127.0.0.1:{port}{path}{query}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_root_health(server):
    assert _call(server, "GET", "/health")[1]["status"] == "healthy"
    assert _call(server, "GET", "/")[1]["status"] == "running"


def test_http_chat(server):
    status, body = _call(server, "POST", "/api/v1/chat/ask",
                         {"question": "什么是机器学习?"})
    assert status == 200 and body["answer"].startswith("echo:")
    assert body["conversation_id"] >= 1
    # history persisted
    assert server.ctx.db.count("message") >= 2
    status, sugg = _call(server, "GET", "/api/v1/chat/suggestions")
    assert status == 200 and len(sugg) >= 3


def test_http_homework(server):
    status, body = _call(server, "POST", "/api/v1/homework/submit",
                         {"student_id": "S001", "title": "essay",
                          "content": "my essay"})
    assert status == 200 and body["data"]["is_graded"] is False
    hw_id = body["data"]["id"]
    assert hw_id.startswith("hw-")
    # the returned id must be the actual stored TEXT primary key
    row = server.ctx.db.query_one(
        "SELECT id, document FROM corrective_records WHERE id=?", (hw_id,))
    assert row is not None and row["document"] == "my essay"
    # resubmitting the same student+title is an update, not a 500
    status, body = _call(server, "POST", "/api/v1/homework/submit",
                         {"student_id": "S001", "title": "essay",
                          "content": "revised essay"})
    assert status == 200 and body["data"]["id"] == hw_id
    row = server.ctx.db.query_one(
        "SELECT document FROM corrective_records WHERE id=?", (hw_id,))
    assert row["document"] == "revised essay"
    status, body = _call(server, "POST", "/api/v1/homework/grade",
                         {"homework_id": 1})
    assert body["data"]["grade"] == "B+"
    assert _call(server, "GET", "/api/v1/homework/list")[1]["data"]["total"] == 5
    assert _call(server, "GET",
                 "/api/v1/homework/homework/3")[1]["data"]["id"] == "3"


def test_http_learning_path_lifecycle(server):
    status, body = _call(server, "POST", "/api/v1/learning-path/generate",
                         {"student_id": "S001", "goal": "learn jax"})
    pid = body["data"]["path_id"]
    status, body = _call(server, "PUT",
                         f"/api/v1/learning-path/paths/{pid}/progress",
                         query="?phase_id=1&progress=40")
    assert body["data"]["phases"][0]["progress"] == 40
    status, body = _call(server, "GET",
                         f"/api/v1/learning-path/paths/{pid}")
    assert body["data"]["goal"] == "learn jax"
    assert _call(server, "PUT",
                 "/api/v1/learning-path/paths/999/progress")[0] == 404


def test_http_lesson_plan_crud(server):
    _, body = _call(server, "POST", "/api/v1/lesson-plan/generate",
                    {"subject": "math", "topic": "matrices"})
    pid = body["data"]["plan_id"]
    _, body = _call(server, "PUT", f"/api/v1/lesson-plan/plans/{pid}",
                    {"topic": "tensors"})
    assert body["data"]["topic"] == "tensors"
    assert _call(server, "GET",
                 "/api/v1/lesson-plan/templates")[1]["data"][0]["template_id"] == 1
    assert _call(server, "DELETE",
                 f"/api/v1/lesson-plan/plans/{pid}")[0] == 200
    assert _call(server, "GET",
                 f"/api/v1/lesson-plan/plans/{pid}")[0] == 404


def test_http_ppt_lifecycle(server):
    _, body = _call(server, "POST", "/api/v1/ppt/create",
                    {"title": "Intro", "topic": "JAX", "num_slides": 3})
    tid = body["data"]["task_id"]
    assert _call(server, "GET",
                 f"/api/v1/ppt/status/{tid}")[1]["data"]["status"] == "completed"
    _, res = _call(server, "GET", f"/api/v1/ppt/result/{tid}")
    assert len(res["data"]["slides"]) == 3
    assert _call(server, "GET", "/api/v1/ppt/templates")[0] == 200
    assert _call(server, "GET",
                 "/api/v1/ppt/projects")[1]["data"]["total"] >= 1
    assert _call(server, "DELETE", f"/api/v1/ppt/projects/{tid}")[0] == 200
    assert _call(server, "GET", f"/api/v1/ppt/status/{tid}")[0] == 404


def test_http_text_organization(server):
    _, body = _call(server, "POST", "/api/v1/text-organization/upload",
                    {"file_name": "doc.txt",
                     "content": "Alpha beta. Gamma delta. Epsilon."})
    did = body["data"]["document_id"]
    _, body = _call(server, "POST", "/api/v1/text-organization/process",
                    {"document_id": did})
    tid = body["data"]["task_id"]
    _, res = _call(server, "GET", f"/api/v1/text-organization/results/{tid}")
    assert res["data"]["results"]["num_sentences"] == 3
    _, docs = _call(server, "GET", "/api/v1/text-organization/documents")
    assert docs["data"]["total"] >= 1
    _, hist = _call(server, "GET", "/api/v1/text-organization/history")
    assert hist["data"]["total"] >= 1
    _, stats = _call(server, "GET", "/api/v1/text-organization/stats")
    assert stats["data"]["total_tasks"] >= 1
    assert _call(server, "DELETE",
                 f"/api/v1/text-organization/documents/{did}")[0] == 200
    assert _call(server, "DELETE",
                 f"/api/v1/text-organization/documents/{did}")[0] == 404


def test_http_file_upload(server):
    assert _call(server, "POST", "/api/v1/files/upload/pdf",
                 {"file_name": "a.pdf"})[0] == 200
    assert _call(server, "POST", "/api/v1/files/upload/image",
                 {"file_name": "b.png"})[0] == 200


def test_http_recommend_503_unconfigured(server):
    status, body = _call(server, "POST", "/api/v1/recommend",
                         {"history": [1, 2], "top_k": 3})
    assert status == 503 and body["success"] is False


def test_http_invalid_json(server):
    import urllib.request as ur
    port = server.server_address[1]
    req = ur.Request(f"http://127.0.0.1:{port}/api/v1/chat/ask",
                     data=b"{not json", method="POST",
                     headers={"Content-Type": "application/json"})
    try:
        with ur.urlopen(req, timeout=10) as r:
            status = r.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_http_non_object_json_body_is_400(server):
    # a valid-JSON but non-object body must be a client error, not a 500
    status, _ = _call(server, "POST", "/api/v1/chat/ask", body=[1, 2, 3])
    assert status == 400


def test_chat_ask_rejects_unknown_conversation(server):
    status, body = _call(server, "POST", "/api/v1/chat/ask",
                         {"question": "hi", "conversation_id": 999999})
    assert status == 200
    # messages must not be attached to the nonexistent conversation
    assert body["conversation_id"] != 999999
    assert server.ctx.db.query_one(
        "SELECT id FROM conversation WHERE id=?",
        (body["conversation_id"],)) is not None


def test_recommend_route_with_recommender_and_db_history():
    from genrec_tpu.serving.recommend import HybridRecommender, ItemCatalog
    from genrec_tpu.data import synthetic
    ids = list(range(1, 9))
    cat = ItemCatalog(
        item_pool=ids,
        item_names={i: f"c{i}" for i in ids},
        item_keywords_pos={i: {"k"} for i in ids},
        item_keywords_neg={i: set() for i in ids},
        item_content={i: "" for i in ids},
        item_url={i: f"u{i}" for i in ids},
        item_embeddings=synthetic.make_item_embs(8, dim=8, num_topics=2,
                                                 seed=1),
    )
    c = _ctx(recommender=HybridRecommender(catalog=cat, seed=0), catalog=cat)
    c.db.insert("students", {"student_id": "9", "name": "n", "password": "x",
                             "major": "cs"})
    for cls in (1, 2):
        c.db.insert("interaction_records",
                    {"student_id": "9", "class_id": cls})
    status, body = dispatch(c, "POST", "/api/v1/recommend",
                            {}, {"user_id": 9, "top_k": 3})
    assert status == 200 and len(body["data"]) == 3
    assert not {r["item_id"] for r in body["data"]} & {1, 2}
    status, body = dispatch(c, "GET", "/api/v1/courses", {}, {})
    assert len(body["data"]) == 8


def test_fastapi_adapter_parity():
    fastapi = pytest.importorskip(
        "fastapi",
        reason="fastapi is not in this image (verified: ModuleNotFoundError; "
               "pip install is disallowed). The stdlib adapter exercises the "
               "same shared handler table, so only adapter glue is untested.")
    from fastapi.testclient import TestClient
    from genrec_tpu.backend.server import create_fastapi_app
    c = _ctx()
    client = TestClient(create_fastapi_app(c))
    assert client.get("/health").json()["status"] == "healthy"
    assert client.post("/api/v1/ppt/create",
                       json={"title": "t", "topic": "x"}).status_code == 200


def test_legacy_api_prefix():
    """Reference mounts api_router under /api/v1 AND /api
    (`backend/app/main.py:48-51`); file-upload (and the repo's live
    recommend routes) stay /api/v1-only (`main.py:53-55`)."""
    assert match_route("GET", "/api/chat/suggestions") is not None
    assert match_route("POST", "/api/chat/") is not None
    assert match_route("GET", "/api/ppt/templates") is not None
    assert match_route("GET", "/api/homework/list") is not None
    assert match_route("GET", "/api/learning-path/paths") is not None
    assert match_route("GET", "/api/lesson-plan/templates") is not None
    assert match_route("GET", "/api/text-organization/stats") is not None
    # v1-only groups must NOT alias
    assert match_route("POST", "/api/files/upload/pdf") is None
    assert match_route("POST", "/api/recommend") is None
    # and legacy rewriting must not shadow the health/root routes
    assert match_route("GET", "/api/v1/chat/suggestions") is not None


def test_reference_segment_aliases():
    """The reference's router prefixes are `/ppt-creation` and
    `/homework-grading` (`ppt_creation.py:17`, `homework_grading.py:16`),
    double-mounted at both /api/v1 and /api, plus underscore spellings
    `/api/v1/homework_grading` and `/api/v1/learning_path`
    (`main.py:53-54`). All must resolve onto the repo's handler table."""
    for path in (
        "/api/v1/ppt-creation/templates", "/api/ppt-creation/templates",
        "/api/v1/homework-grading/list", "/api/homework-grading/list",
        "/api/v1/homework_grading/list",
        "/api/v1/learning_path/paths",
    ):
        assert match_route("GET", path) is not None, path
    assert match_route("POST", "/api/ppt-creation/create") is not None
    assert match_route("POST", "/api/homework-grading/submit") is not None


def test_legacy_prefix_over_http(server):
    status, sugg = _call(server, "GET", "/api/chat/suggestions")
    assert status == 200
    assert sugg == _call(server, "GET", "/api/v1/chat/suggestions")[1]


def test_static_mount(tmp_path):
    import threading
    (tmp_path / "sub").mkdir()
    (tmp_path / "index.html").write_text("<html>frontend</html>")
    (tmp_path / "sub" / "app.js").write_text("console.log(1)")
    (tmp_path / "my asset 图.js").write_text("ok")
    db = Database(":memory:")
    db.create_all()
    ctx = AppContext(settings=Settings(static_dir=str(tmp_path)), db=db,
                     ai=AIService(llm=None),
                     textorg=TextOrganizationService(db))
    srv = BackendHTTPServer(ctx, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/static/index.html", timeout=10) as r:
            assert r.status == 200 and b"frontend" in r.read()
            assert "text/html" in r.headers["Content-Type"]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/static/sub/app.js", timeout=10) as r:
            assert r.status == 200
        # percent-encoded names (spaces, unicode) must decode before join
        enc = urllib.parse.quote("my asset 图.js")
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/static/{enc}", timeout=10) as r:
            assert r.status == 200 and r.read() == b"ok"
        # missing file and traversal out of the mount both 404 — including
        # an ENCODED traversal (decode must happen before the containment
        # check, not after)
        for bad in ("/static/nope.css", "/static/../test_backend.py",
                    "/static/%2e%2e/test_backend.py"):
            try:
                urllib.request.urlopen(f"http://127.0.0.1:{port}{bad}",
                                       timeout=10)
                raised = False
            except urllib.error.HTTPError as e:
                raised = e.code == 404
            assert raised, bad
    finally:
        srv.shutdown()
