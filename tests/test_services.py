"""CREATE SERVICE / EXECUTE SERVICE / GENERATE CODE (services.py;
reference: Parser.java:4252 parseCreateService, SqlScript.java:166-191
canonical service DDL, generated-model classes in lealone-test orm/)."""

from __future__ import annotations

import importlib.util

import pytest

from etl_lealone_spark.session import EngineSession


class HelloWorldServiceImpl:
    """The Python twin of the reference's HelloWorldServiceImpl
    (IMPLEMENT BY target — resolved by module path at call time)."""

    def say_hello(self):
        return "hello"

    def say_goodbye_to(self, name):
        return f"goodbye {name}"


class UserServiceImpl:
    def __init__(self):
        self.users = {}

    def add(self, name):
        self.users[name] = len(self.users) + 1
        return self.users[name]

    def find(self, name):
        return self.users.get(name)


def _load(path: str, modname: str):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def es(spark, tmp_path):
    return EngineSession(spark, warehouse=str(tmp_path))


SERVICE_DDL = (
    "CREATE SERVICE IF NOT EXISTS hello_world_service ("
    " say_hello() void,"
    " say_goodbye_to(name varchar) varchar)"
    " IMPLEMENT BY 'test_services.HelloWorldServiceImpl'"
)


def test_execute_service(es):
    es.sql(SERVICE_DDL)
    row = es.sql(
        "EXECUTE SERVICE hello_world_service say_goodbye_to('zhh')"
    ).collect()[0]
    assert row.result == "goodbye zhh"
    assert es.sql(
        "EXECUTE SERVICE hello_world_service say_hello()"
    ).collect()[0].result == "hello"


def test_service_state_and_unknown_method(es):
    es.sql(
        "CREATE SERVICE user_service (add(name varchar) long, "
        "find(name varchar) varchar) "
        "IMPLEMENT BY 'test_services.UserServiceImpl'"
    )
    assert es.call_service("user_service", "add", "u1") == 1
    assert es.call_service("user_service", "add", "u2") == 2
    # same cached instance serves the whole session
    assert es.call_service("user_service", "find", "u1") == 1
    with pytest.raises(ValueError, match="no method"):
        es.call_service("user_service", "nope")


def test_generated_service_client(es, tmp_path):
    gen = tmp_path / "gen"
    es.sql(
        "CREATE SERVICE hello_world_service ("
        " say_hello() void,"
        " say_goodbye_to(name varchar) varchar)"
        " PACKAGE 'svc.clients'"
        f" IMPLEMENT BY 'test_services.HelloWorldServiceImpl'"
        f" GENERATE CODE '{gen}'"
    )
    path = gen / "svc" / "clients" / "hello_world_service_service.py"
    assert path.exists()
    mod = _load(str(path), "gen_hello_client")
    client = mod.HelloWorldService(es)
    assert client.say_goodbye_to("spark") == "goodbye spark"


def test_generated_table_model(es, tmp_path):
    gen = tmp_path / "genm"
    es.sql(
        "CREATE TABLE user (name char(10) PRIMARY KEY, notes varchar, "
        "phone int, id long)"
        " PACKAGE 'model'"
        f" GENERATE CODE '{gen}'"
    )
    es.sql("INSERT INTO user VALUES ('u1', 'n', 123, 1), ('u2', 'n', 456, 2)")
    path = gen / "model" / "user_model.py"
    assert path.exists()
    mod = _load(str(path), "gen_user_model")
    assert mod.User.COLUMNS == ("name", "notes", "phone", "id")
    dao = mod.User.dao(es)
    rows = dao.where(dao.p.phone.gt(200)).find_list()
    assert len(rows) == 1 and rows[0].name.strip() == "u2"


def test_drop_service_and_script_roundtrip(es):
    es.sql(SERVICE_DDL)
    script = [r[0] for r in es.sql("SCRIPT NODATA").collect()]
    assert any("CREATE SERVICE" in stmt for stmt in script)
    es.sql("DROP SERVICE hello_world_service")
    with pytest.raises(KeyError):
        es.sql("EXECUTE SERVICE hello_world_service say_hello()")


def test_call_execute_service_functions(es):
    """CALL EXECUTE_SERVICE_WITH_RETURN_VALUE('svc.method', json_args)
    (Function.java:379-380): the reference's SQL-level entry points."""
    es.sql(SERVICE_DDL)
    row = es.sql(
        "CALL EXECUTE_SERVICE_WITH_RETURN_VALUE("
        "'hello_world_service.say_goodbye_to', '[\"zhh\"]')"
    ).collect()[0]
    assert row.result == "goodbye zhh"
    row = es.sql(
        "CALL EXECUTE_SERVICE_NO_RETURN_VALUE("
        "'hello_world_service.say_hello', '[]')"
    ).collect()[0]
    assert row.result is None


def test_information_schema_services(es):
    es.sql(SERVICE_DDL)
    rows = es.sql(
        "SELECT service_name, methods, implement_by "
        "FROM INFORMATION_SCHEMA.SERVICES"
    ).collect()
    assert len(rows) == 1
    assert rows[0].service_name == "hello_world_service"
    assert rows[0].methods == "say_goodbye_to,say_hello"
    assert "HelloWorldServiceImpl" in rows[0].implement_by
