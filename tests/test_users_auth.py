"""Users, roles and authorization (reference ``tinyolap/users.py:1-41``,
``tinyolap/authorization.py:9-69``): capability-ordered roles, a per-
database user registry persisted through save/open, and HTTP Basic role
gates on the REST/GraphQL layer."""

import json
import urllib.error
import urllib.request
from base64 import b64encode

import pytest

from tinyolap_spark import (
    Database,
    NotAuthorizedError,
    TinyOlapError,
    User,
    UserCollection,
    UserRole,
)


# ---------------------------------------------------------- pure metadata
def test_role_capability_order():
    """READER < WRITER < EDITOR < ADMIN; each role's action set is a
    superset of the one below (reference authorization.py docstrings)."""
    cases = {
        UserRole.READER: {"read"},
        UserRole.WRITER: {"read", "write"},
        UserRole.EDITOR: {"read", "write", "model"},
        UserRole.ADMIN: {"read", "write", "model", "admin"},
    }
    all_actions = {"read", "write", "model", "admin"}
    for role, allowed in cases.items():
        u = User("u", role=role)
        for action in all_actions:
            assert u.can(action) == (action in allowed), (role, action)
    with pytest.raises(TinyOlapError, match="unknown action"):
        User("u").can("fly")
    assert UserRole.parse("writer") is UserRole.WRITER
    with pytest.raises(TinyOlapError, match="unknown role"):
        UserRole.parse("king")


def test_user_collection_defaults_and_guards():
    coll = UserCollection()
    assert "admin" in coll and coll["admin"].role == UserRole.ADMIN
    coll.add("alice", "pw1", role="reader")
    with pytest.raises(TinyOlapError, match="already exists"):
        coll.add("Alice")
    # last-admin guard
    with pytest.raises(TinyOlapError, match="last admin"):
        coll.remove("admin")
    coll.add("root2", role=UserRole.ADMIN)
    coll.remove("admin")  # fine now
    assert len(coll) == 2


def test_password_hash_and_authenticate():
    coll = UserCollection()
    u = coll.add("bob", "s3cret", role="writer")
    assert u.password is not None and "s3cret" not in u.password
    assert coll.authenticate("bob", "s3cret") is u
    assert coll.authenticate("bob", "wrong") is None
    assert coll.authenticate("nobody", "x") is None
    # passwordless users authenticate with empty credentials only
    coll.add("guest", role="reader")
    assert coll.authenticate("guest") is not None
    assert coll.authenticate("guest", "anything") is None


# --------------------------------------------------- database integration
def test_database_require_and_persistence(spark, tmp_path):
    db = Database("authdb", spark=spark)
    d = db.add_dimension("d").edit()
    d.add_many("All", ["a"])
    d.commit()
    cube = db.add_cube("c", [d])
    cube[("a",)] = 1.0
    db.users.add("viewer", "vpw", role="reader")
    db.users.add("writer", "wpw", role="writer")

    assert db.authorize("viewer", "read")
    assert not db.authorize("viewer", "write")
    assert db.authorize("writer", "write")
    assert not db.authorize("writer", "model")
    assert not db.authorize("ghost", "read")  # unknown users can do nothing
    with pytest.raises(NotAuthorizedError, match="viewer"):
        db.require("viewer", "write")
    db.require("admin", "admin")

    p = str(tmp_path / "authdb")
    db.save(p)
    db2 = Database.open(p, spark=spark)
    assert len(db2.users) == 3
    assert db2.users.authenticate("writer", "wpw").role == UserRole.WRITER
    assert db2.users.authenticate("writer", "vpw") is None
    with pytest.raises(NotAuthorizedError):
        db2.require("viewer", "write")


# ----------------------------------------------------------- REST gating
def _call(base, method, path, body=None, creds=None):
    headers = {"Content-Type": "application/json"}
    if creds:
        headers["Authorization"] = "Basic " + b64encode(
            f"{creds[0]}:{creds[1]}".encode()
        ).decode()
    req = urllib.request.Request(
        base + path,
        data=json.dumps(body).encode() if body is not None else None,
        method=method,
        headers=headers,
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_rest_auth_role_gates(spark):
    """Role-gated cell write over HTTP (VERDICT r4 #7): 401 without
    credentials, 403 for a reader writing, 200 for a writer; GraphQL
    mutations gate as writes."""
    from tinyolap_spark.api import RestServer

    db = Database("secure", spark=spark)
    d1 = db.add_dimension("d1").edit()
    d1.add_many("All", ["a", "b"])
    d1.commit()
    cube = db.add_cube("c", [d1])
    cube.write_rows([("a", 1.0), ("b", 2.0)])
    db.users.add("viewer", "vpw", role="reader")
    db.users.add("writer", "wpw", role="writer")

    srv = RestServer(db, auth=True).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        # no credentials -> 401 with a challenge
        st, out = _call(base, "GET", "/catalog")
        assert st == 401
        # wrong password -> 401
        st, _ = _call(base, "GET", "/catalog", creds=("viewer", "nope"))
        assert st == 401
        # reader reads fine
        st, out = _call(base, "GET", "/catalog", creds=("viewer", "vpw"))
        assert st == 200 and out["database"]["cubes"][0]["id"] == "c"
        st, out = _call(
            base, "POST", "/cells/get",
            {"database": "secure", "cube": "c", "members": ["All"]},
            creds=("viewer", "vpw"),
        )
        assert (st, out["value"]) == (200, 3.0)
        # reader cannot write (REST or GraphQL mutation)
        put = {"database": "secure", "cube": "c", "members": ["a"], "value": 9.0}
        st, out = _call(base, "PUT", "/cells", put, creds=("viewer", "vpw"))
        assert st == 403 and "not authorized" in out["detail"]
        gql = {"query": 'mutation { write(cube: "c", address: ["a"], value: 9.0) }'}
        st, out = _call(base, "POST", "/graphql", gql, creds=("viewer", "vpw"))
        assert st == 403
        assert cube[("a",)] == 1.0  # value untouched
        # writer writes through both surfaces
        st, _ = _call(base, "PUT", "/cells", put, creds=("writer", "wpw"))
        assert st == 200 and cube[("a",)] == 9.0
        st, out = _call(base, "POST", "/graphql", gql, creds=("writer", "wpw"))
        assert st == 200 and out == {"data": {"write": True}}
        # GraphQL query (non-mutation) allowed for the reader
        st, out = _call(
            base, "POST", "/graphql",
            {"query": '{ read(cube: "c", address: ["All"]) { value } }'},
            creds=("viewer", "vpw"),
        )
        assert st == 200 and out["data"]["read"]["value"] == 11.0
    finally:
        srv.shutdown()


def test_rest_auth_hardening(spark):
    """Code-review regressions: (1) a leading GraphQL comment must not
    disguise a mutation; (2) random_write is a QUERY field that writes —
    readers get 403; (3) passwordless accounts are refused over HTTP;
    (4) db-less GraphQL needs the action on EVERY database (no cross-db
    escalation)."""
    from tinyolap_spark.api import RestServer

    def _mkdb(name):
        db = Database(name, spark=spark)
        d = db.add_dimension("d").edit()
        d.add_many("All", ["a", "b"])
        d.commit()
        cube = db.add_cube("c", [d])
        cube.write_rows([("a", 1.0), ("b", 2.0)])
        return db, cube

    dba, cube_a = _mkdb("dba")
    dbb, cube_b = _mkdb("dbb")
    dba.users.add("viewer", "vpw", role="reader")
    dbb.users.add("bob", "bpw", role="writer")  # writer ONLY in dbb
    dba.users.add("bob", "bpw", role="reader")  # reader in dba
    dbb.users.add("mallory", "mpw", role="writer")  # NO account in dba

    srv = RestServer({"dba": dba, "dbb": dbb}, auth=True).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        # (1) leading comment must still classify as a write
        sneaky = {"query": '#x\nmutation { write(db: "dba", cube: "c", '
                           'address: ["a"], value: 999.0) }'}
        st, _ = _call(base, "POST", "/graphql", sneaky, creds=("viewer", "vpw"))
        assert st == 403
        assert cube_a[("a",)] == 1.0
        # (2) random_write through a plain query -> still a write action
        rw = {"query": '{ random_write(db: "dba") { value } }'}
        st, _ = _call(base, "POST", "/graphql", rw, creds=("viewer", "vpw"))
        assert st == 403
        # (3) the default passwordless admin is refused over HTTP
        st, _ = _call(base, "GET", "/catalog", creds=("admin", ""))
        assert st == 401
        # (4) bob (writer only in dbb) cannot write into dba via a db-less
        # GraphQL document
        st, _ = _call(base, "POST", "/graphql", sneaky, creds=("bob", "bpw"))
        assert st == 403
        assert cube_a[("a",)] == 1.0
        # (4b) membership-scoped authorize: mallory has NO account in dba —
        # her dbb writer role must carry nothing there (authorize
        # re-resolves by name per database, not by User object)
        st, _ = _call(base, "POST", "/graphql",
                      {"query": 'mutation { write(db: "dba", cube: "c", '
                                'address: ["a"], value: 666.0) }'},
                      creds=("mallory", "mpw"))
        assert st == 403
        assert not dba.authorize(dbb.users["mallory"], "read")
        assert cube_a[("a",)] == 1.0
        # but a parameterized READ with variables still classifies as read
        q = {"query": 'query R($c: String!) { read(db: "dba", cube: $c, '
                      'address: ["All"]) { value } }', "variables": {"c": "c"}}
        st, out = _call(base, "POST", "/graphql", q, creds=("bob", "bpw"))
        assert st == 200 and out["data"]["read"]["value"] == 3.0
    finally:
        srv.shutdown()


def test_user_rename_rekeys_lookup():
    coll = UserCollection()
    u = coll.add("alice", "pw", role="reader")
    u.rename("bob")
    assert coll.get("bob") is u          # lazily re-keyed
    assert coll.authenticate("bob", "pw") is u
    assert coll.get("alice") is None
