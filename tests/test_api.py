"""HTTP facade tests: real sockets against the stdlib server, exercising
the validated-filter path, pagination envelope, bearer auth, and error
shapes the reference's DRF front door defines."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from tantalus_spark.api import ApiServer


@pytest.fixture(scope="module")
def server(tdb):
    srv = ApiServer(tdb)
    host, port = srv.serve_background()
    yield f"http://{host}:{port}"
    srv.shutdown()


def get(base, path, headers=None):
    req = urllib.request.Request(base + path, headers=headers or {})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_endpoint_directory(server):
    status, body = get(server, "/api/")
    assert status == 200
    assert "sequence_dataset" in body["endpoints"]


def test_filtered_list_with_pagination(server):
    status, body = get(
        server, "/api/sequence_dataset/?tags__name=prod&page_size=1&page=2")
    assert status == 200
    assert body["count"] == 2          # DS1 and DS2 carry tag 'prod'
    assert len(body["results"]) == 1   # page-sized
    assert body["page"] == 2


def test_related_path_filter(server):
    status, body = get(server, "/api/sample/?patient__patient_id=SA100")
    assert status == 200
    assert {r["id"] for r in body["results"]} == {1, 2}


def test_unknown_param_is_400_naming_legal_set(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        get(server, "/api/sample/?bogus=1")
    assert e.value.code == 400
    assert "no filter" in json.loads(e.value.read())["detail"]


def test_unknown_endpoint_is_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        get(server, "/api/nope/")
    assert e.value.code == 404


def test_bearer_token_auth(tdb):
    srv = ApiServer(tdb, token="s3cret")
    host, port = srv.serve_background()
    base = f"http://{host}:{port}"
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            get(base, "/api/")
        assert e.value.code == 401
        status, body = get(base, "/api/tag/?name=qc",
                           headers={"Authorization": "Bearer s3cret"})
        assert status == 200 and body["count"] == 1
    finally:
        srv.shutdown()


def test_jwt_auth(tdb):
    import time as _time

    from tantalus_spark.api import encode_jwt, verify_jwt

    srv = ApiServer(tdb, jwt_secret="jwt-s3cret")
    host, port = srv.serve_background()
    base = f"http://{host}:{port}"
    try:
        # no token -> 401
        with pytest.raises(urllib.error.HTTPError) as e:
            get(base, "/api/")
        assert e.value.code == 401
        # valid token
        tok = encode_jwt({"sub": "alice", "exp": _time.time() + 60},
                         "jwt-s3cret")
        status, body = get(base, "/api/tag/?name=qc",
                           headers={"Authorization": f"Bearer {tok}"})
        assert status == 200 and body["count"] == 1
        # expired token -> 401
        old = encode_jwt({"sub": "alice", "exp": _time.time() - 1},
                         "jwt-s3cret")
        with pytest.raises(urllib.error.HTTPError) as e:
            get(base, "/api/", headers={"Authorization": f"Bearer {old}"})
        assert e.value.code == 401
        # wrong secret -> 401
        forged = encode_jwt({"sub": "eve"}, "other-secret")
        with pytest.raises(urllib.error.HTTPError) as e:
            get(base, "/api/", headers={"Authorization": f"Bearer {forged}"})
        assert e.value.code == 401
    finally:
        srv.shutdown()

    # unit-level: alg downgrade rejected
    import base64 as _b64
    import json as _json
    header = _b64.urlsafe_b64encode(
        _json.dumps({"alg": "none"}).encode()).rstrip(b"=").decode()
    body = _b64.urlsafe_b64encode(b"{}").rstrip(b"=").decode()
    assert verify_jwt(f"{header}.{body}.", "jwt-s3cret") is None


def post(base, path, payload, method="POST", headers=None):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(), method=method,
        headers={"Content-Type": "application/json", **(headers or {})})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_post_create_and_put_upsert(tdb):
    srv = ApiServer(tdb)
    host, port = srv.serve_background()
    base = f"http://{host}:{port}"
    try:
        # create with auto-assigned id
        status, body = post(base, "/api/tag/", {"name": "новый"})
        assert status == 201 and body["ids"] == [4]
        status, got = get(base, "/api/tag/?id=4")
        assert got["results"][0]["name"] == "новый"
        # duplicate id on POST -> 400
        with pytest.raises(urllib.error.HTTPError) as e:
            post(base, "/api/tag/", {"id": 4, "name": "again"})
        assert e.value.code == 400
        # PUT upserts by pk
        status, body = post(base, "/api/tag/", {"id": 4, "name": "renamed"},
                            method="PUT")
        assert status == 200
        _, got = get(base, "/api/tag/?id=4")
        assert got["results"][0]["name"] == "renamed"
        # unknown column -> 400 naming legal set
        with pytest.raises(urllib.error.HTTPError) as e:
            post(base, "/api/tag/", {"nonsense": 1})
        assert e.value.code == 400
        assert "unknown columns" in json.loads(e.value.read())["detail"]
    finally:
        # restore the fixture table for other tests (module-scoped tdb)
        from pyspark.sql import functions as F
        srv.db.add("tag", srv.db.table("tag").filter(F.col("id") <= 3))
        srv.shutdown()


def test_delete_by_pk(tdb):
    srv = ApiServer(tdb)
    host, port = srv.serve_background()
    base = f"http://{host}:{port}"
    try:
        status, body = post(base, "/api/tag/", {"name": "ephemeral"})
        new_id = body["ids"][0]
        req = urllib.request.Request(
            f"{base}/api/tag/?id={new_id}", method="DELETE")
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = json.loads(resp.read())
        assert out["deleted"] == 1
        _, got = get(base, f"/api/tag/?id={new_id}")
        assert got["count"] == 0
        # deleting a missing id reports 0
        req = urllib.request.Request(
            f"{base}/api/tag/?id=99999", method="DELETE")
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert json.loads(resp.read())["deleted"] == 0
    finally:
        srv.shutdown()


def test_post_batch_id_assignment_no_collision(tdb):
    srv = ApiServer(tdb)
    host, port = srv.serve_background()
    base = f"http://{host}:{port}"
    try:
        # explicit id beyond max + an auto row in one batch: auto id must
        # skip the explicit one, and intra-batch duplicates are rejected
        status, body = post(base, "/api/tag/", [
            {"id": 4, "name": "explicit"}, {"name": "auto"}])
        assert status == 201
        assert sorted(body["ids"]) == [4, 5]
        with pytest.raises(urllib.error.HTTPError) as e:
            post(base, "/api/tag/", [{"id": 9, "name": "a"},
                                     {"id": 9, "name": "b"}])
        assert e.value.code == 400
        # errors produce structured responses, not dropped connections
        with pytest.raises(urllib.error.HTTPError) as e:
            get(base, "/api/tag/?page=0&page_size=abc")
        assert e.value.code == 400
        # page_size clamps to 100 (reference max page size)
        _, got = get(base, "/api/tag/?page_size=999999999")
        assert got["page_size"] == 100
    finally:
        from pyspark.sql import functions as F
        srv.db.add("tag", srv.db.table("tag").filter(F.col("id") <= 3))
        srv.shutdown()


def test_put_partial_body_and_intra_batch_dups(tdb):
    srv = ApiServer(tdb)
    host, port = srv.serve_background()
    base = f"http://{host}:{port}"
    try:
        # a PUT body omitting columns keeps their existing values (the
        # reference's DRF PUT would 400; merging is the lossless superset
        # — omitted != "set to NULL")
        status, _ = post(base, "/api/sample/",
                         {"id": 2, "note": "updated"}, method="PUT")
        assert status == 200
        _, got = get(base, "/api/sample/?id=2")
        row = got["results"][0]
        assert row["note"] == "updated"
        assert row["sample_id"] == "SA100B"      # untouched columns survive
        assert row["tissue"] == "ovary"
        # a pk not in the table inserts with omitted columns NULL
        status, _ = post(base, "/api/sample/",
                         {"id": 77, "sample_id": "SA777"}, method="PUT")
        assert status == 200
        _, got = get(base, "/api/sample/?id=77")
        assert got["results"][0]["tissue"] is None
        # intra-batch duplicate pks would leave two rows post-upsert: 400
        with pytest.raises(urllib.error.HTTPError) as e:
            post(base, "/api/sample/",
                 [{"id": 3, "note": "x"}, {"id": 3, "note": "y"}],
                 method="PUT")
        assert e.value.code == 400
    finally:
        from pyspark.sql import functions as F
        t = srv.db.table("sample")
        srv.db.add("sample", t.filter(F.col("id") <= 5).withColumn(
            "note", F.when(F.col("id") == 2, "note b").otherwise(
                F.col("note"))))
        srv.shutdown()


def test_facade_write_lineage_bounded(tdb):
    # 20 upsert cycles over 5 checkpoint periods: without the periodic
    # localCheckpoint each write stacks an anti-join+union layer and the
    # logical plan grows without bound in a long-lived server (r14:
    # shrunk from 40 cycles/8-deep periods to 20/4-deep — same 5-period
    # coverage, half the suite wall)
    srv = ApiServer(tdb)
    srv.CHECKPOINT_EVERY = 4
    host, port = srv.serve_background()
    base = f"http://{host}:{port}"
    try:
        for i in range(20):
            status, _ = post(base, "/api/tag/",
                             {"id": 2, "name": f"cycle{i}"}, method="PUT")
            assert status == 200
        depth = len(srv.db.table("tag")._jdf.queryExecution()
                    .logical().treeString().splitlines())
        # 4 un-checkpointed layers x ~4 nodes each, plus slack; an
        # unbounded chain after 20 writes is >150 lines
        assert depth < 80, f"plan depth {depth} not bounded"
        _, got = get(base, "/api/tag/?id=2")
        assert got["results"][0]["name"] == "cycle19"
        assert srv.db.table("tag").count() == 3
    finally:
        from pyspark.sql import functions as F
        srv.db.add("tag", srv.db.table("tag").filter(F.col("id") <= 3)
                   .withColumn("name", F.when(F.col("id") == 2, "qc")
                               .otherwise(F.col("name"))))
        srv.shutdown()


def test_expand_nested_serialization(server):
    """?expand= returns the reference read-serializer shape (nested
    sample/library objects, sequence_lanes list, is_complete) from one
    join-based plan — no per-row N+1."""
    status, body = get(
        server,
        "/api/sequence_dataset/?id=1"
        "&expand=sample,library,sequence_lanes,tags,is_complete")
    assert status == 200
    row = body["results"][0]
    assert row["sample"]["sample_id"] == "SA100A"      # nested FK object
    assert row["library"]["library_id"] == "A001"
    lanes = {(l["flowcell_id"], l["lane_number"])
             for l in row["sequence_lanes"]}
    assert lanes == {("FC1", "1"), ("FC1", "2")}       # nested M2M list
    assert sorted(t["name"] for t in row["tags"]) == ["prod", "qc"]
    assert row["is_complete"] is True                  # both lib-1 lanes
    # DS2 holds 1 of library 1's 2 lanes -> incomplete; empty tags -> []
    _, body = get(server,
                  "/api/sequence_dataset/?id=2&expand=is_complete,tags")
    row = body["results"][0]
    assert row["is_complete"] is False
    assert row["tags"] == [{"id": 1, "name": "prod", "owner_id": None}]
    # unknown accessor -> 400 naming the legal set
    with pytest.raises(urllib.error.HTTPError) as e:
        get(server, "/api/sequence_dataset/?expand=bogus")
    assert e.value.code == 400
    assert "no relationship" in json.loads(e.value.read())["detail"]


def test_schema_endpoint(server):
    status, body = get(server, "/api/schema/")
    assert status == 200
    s = body["endpoints"]["sample"]
    assert s["primary_key"] == "id"
    assert s["columns"]["sample_id"] == "string"
    assert "patient__patient_id" in s["filters"]
    assert "sequencedataset__id__isnull" in s["filters"]
    assert "projects" in s["expand"]            # M2M accessor
    assert "patient" in s["expand"]             # forward FK accessor


def test_csv_export_endpoint(server):
    """Reference dataset_set_to_CSV over the facade: selected datasets
    as a text/csv attachment with the derived columns."""
    req = urllib.request.Request(
        server + "/api/sequence_dataset/csv/?id__in=1,2")
    with urllib.request.urlopen(req, timeout=60) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "text/csv"
        assert "attachment" in resp.headers["Content-Disposition"]
        body = resp.read().decode()
    lines = body.strip().splitlines()
    assert lines[0].startswith("id,")            # header row
    assert len(lines) == 3                       # header + 2 datasets
    assert "DS1" in lines[1] and "DS2" in lines[2]
    with pytest.raises(urllib.error.HTTPError) as e:
        get(server, "/api/sequence_dataset/csv/?id__in=x")
    assert e.value.code == 400


def test_facade_soak_mixed_traffic(tdb):
    """ADVICE soak closure: ~100 mixed HTTP operations (PUT upserts
    interleaved with POST+DELETE pairs, filtered lists, ?expand= reads
    and CSV export) against one long-lived server — asserting (a)
    latency stays stable (the final phase is not slower than the
    warmed-up early phase beyond noise) and (b) the table's logical-plan
    depth stays bounded by the lineage checkpoint, i.e. the facade can
    run for days, not demos. Sized to cover 8 full checkpoint periods
    (32 writes / CHECKPOINT_EVERY=4) — each op is a full Spark job
    round-trip, so op count, not wall time, is the lever; an
    unbounded-lineage regression shows up well within one period as
    monotone per-phase drift. (r14: shrunk from 60 writes/8-deep
    periods to 32/4-deep — MORE periods, half the suite wall; the
    drift and plan-depth assertions are unchanged.)"""
    import time

    srv = ApiServer(tdb)
    srv.CHECKPOINT_EVERY = 4
    host, port = srv.serve_background()
    base = f"http://{host}:{port}"
    phase_times: list[list[float]] = []
    try:
        for phase in range(4):
            times = []
            for i in range(8):
                n = phase * 8 + i
                t0 = time.time()
                status, _ = post(base, "/api/tag/",
                                 {"id": 2, "name": f"soak{n}"}, method="PUT")
                assert status == 200
                if n % 5 == 1:
                    status, body = post(base, "/api/tag/",
                                        {"name": f"eph{n}"})
                    assert status in (200, 201)
                    eph = body["ids"][0]
                    req = urllib.request.Request(
                        f"{base}/api/tag/?id={eph}", method="DELETE")
                    with urllib.request.urlopen(req, timeout=60) as resp:
                        assert json.loads(resp.read())["deleted"] == 1
                if n % 5 == 3:
                    _, got = get(base, "/api/tag/?id=2")
                    assert got["results"][0]["name"] == f"soak{n}"
                if n % 10 == 7:
                    _, body = get(
                        base, "/api/sequence_dataset/?id=1&expand=sample,tags")
                    assert body["results"][0]["sample"]["sample_id"] == "SA100A"
                if n % 16 == 9:
                    req = urllib.request.Request(
                        base + "/api/sequence_dataset/csv/?id__in=1,2")
                    with urllib.request.urlopen(req, timeout=60) as resp:
                        assert resp.status == 200 and resp.read()
                times.append(time.time() - t0)
            phase_times.append(times)
        med = [sorted(ts)[len(ts) // 2] for ts in phase_times]
        # latency stability: final-phase median within 3x of the
        # post-warmup phase (generous: CI boxes jitter, drift is what a
        # lineage leak produces — r2's unbounded chain grew >10x here)
        assert med[3] < 3 * med[1] + 0.05, f"latency drifted: {med}"
        depth = len(srv.db.table("tag")._jdf.queryExecution()
                    .logical().treeString().splitlines())
        assert depth < 80, f"plan depth {depth} not bounded after the soak"
        _, got = get(base, "/api/tag/?id=2")
        assert got["results"][0]["name"] == "soak31"
    finally:
        from pyspark.sql import functions as F
        srv.db.add("tag", srv.db.table("tag").filter(F.col("id") <= 3)
                   .withColumn("name", F.when(F.col("id") == 2, "qc")
                               .otherwise(F.col("name"))))
        srv.shutdown()
