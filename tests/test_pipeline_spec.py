"""Spec model unit tests — gasket's normalize/split semantics including
the intended-surface cases from SURVEY.md §2.4."""

import pytest

from gasket_spark.pipeline.spec import Stage, normalize_stage, split_groups


def test_bare_string_is_pipe_command():
    # SURVEY §2.4.1: strings are the `gasket add` format; intended
    # semantic is {command, type: pipe} even though v2.0.1 throws.
    st = normalize_stage("cat -")
    assert st.kind == "command" and st.command == "cat -" and st.type == "pipe"


def test_dict_command_stage():
    st = normalize_stage({"command": "echo hi", "type": "run", "params": [1]})
    assert st.kind == "command" and st.type == "run" and st.params == ["1"]


def test_module_stage_first_class():
    # SURVEY §2.4.2: module/json stages are documented surface.
    st = normalize_stage({"module": "mypkg.mod:fn", "json": True})
    assert st.kind == "module" and st.json is True


def test_nested_readme_form():
    # readme.md:89-92 nested {"command": {"module": ...}} form.
    st = normalize_stage({"command": {"module": "m:f"}, "type": "fork"})
    assert st.kind == "module" and st.module == "m:f" and st.type == "fork"


def test_callable_stage():
    fn = lambda df, ctx: df  # noqa: E731
    st = normalize_stage(fn)
    assert st.kind == "module" and st.module is fn


def test_bad_type_raises():
    with pytest.raises(ValueError):
        normalize_stage({"command": "x", "type": "zigzag"})


def test_split_groups_maximal_runs():
    # Empirically matches the reference split (index.js:94-115):
    # pipe,pipe,run,pipe,background → 4 groups.
    stages = ["a", "b", {"command": "c", "type": "run"}, "d",
              {"command": "e", "type": "background"}]
    groups = split_groups(stages)
    assert [g[0].type for g in groups] == ["pipe", "run", "pipe", "background"]
    assert [len(g) for g in groups] == [2, 1, 1, 1]


def test_stage_roundtrip_json():
    assert normalize_stage("cat -").to_json() == "cat -"
    st = Stage(kind="module", module="m:f", json=True, type="map")
    assert st.to_json() == {"type": "map", "module": "m:f", "json": True}
