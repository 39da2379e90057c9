"""Config regression tests (configuration_files_test.cc analog): every
shipped preset loads cleanly, and unknown keys are rejected at every level
of the tree — the strict-override counterpart of LuaParameterDictionary's
unused-key reference counting (common/lua_parameter_dictionary.cc)."""

import dataclasses

import pytest

from dliom_tpu.common.config import PRESETS, EngineConfig, load_config


@pytest.mark.parametrize("preset", sorted(PRESETS))
def test_every_preset_loads(preset):
    cfg = load_config(preset)
    assert isinstance(cfg, EngineConfig)
    # a few load-bearing invariants every preset must satisfy
    tb = cfg.trajectory_builder
    assert tb.scan_period > 0
    assert tb.submaps.num_range_data > 0
    assert tb.submaps.high_resolution <= tb.submaps.low_resolution
    assert cfg.pose_graph.constraint_builder.min_score > 0


def test_unknown_top_level_key_rejected():
    with pytest.raises(KeyError):
        load_config("basic", {"not_a_section": {}})


def test_unknown_nested_key_rejected():
    with pytest.raises(KeyError):
        load_config("basic", {"trajectory_builder": {"no_such_option": 1}})
    with pytest.raises(KeyError):
        load_config(
            "basic",
            {"trajectory_builder": {"submaps": {"high_res": 0.1}}},
        )
    with pytest.raises(KeyError):
        load_config(
            "basic",
            {"pose_graph": {"constraint_builder": {"minScore": 0.5}}},
        )


def test_unknown_preset_rejected():
    with pytest.raises(KeyError):
        load_config("no-such-preset")


def test_override_is_pure():
    base = load_config("basic")
    mod = base.override({"trajectory_builder": {"scan_period": 0.05}})
    assert mod.trajectory_builder.scan_period == 0.05
    assert base.trajectory_builder.scan_period != 0.05


def test_every_field_reachable_by_override():
    """Every leaf in the dataclass tree must be addressable through
    override() — i.e. the strict-key walker covers the whole tree."""

    def walk(obj, path=()):
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if dataclasses.is_dataclass(v):
                walk(v, path + (f.name,))
            else:
                # build a nested override dict that sets this leaf to itself
                d = {f.name: v}
                for key in reversed(path):
                    d = {key: d}
                load_config("basic", d)

    walk(load_config("basic"))


def test_every_config_key_is_read_by_code():
    """Anti-parity-theater regression (the inverse of
    LuaParameterDictionary's unused-key detection): every field in the
    config tree must be referenced by some non-config code path. A field
    that only exists in config.py is a dead key — wire it or delete it
    (see the dead-key policy notes in common/config.py)."""
    import dataclasses
    import pathlib
    import re

    from dliom_tpu.common import config as cfgmod

    root = pathlib.Path(cfgmod.__file__).resolve().parents[1]
    source = ""
    for p in root.rglob("*.py"):
        if p.name == "config.py":
            continue
        source += p.read_text()
    # the repo-level entry points read capacity knobs too
    for extra in ("__graft_entry__.py", "bench.py"):
        ep = root.parents[0] / extra
        if ep.exists():
            source += ep.read_text()

    def walk(cls, prefix=""):
        for f in dataclasses.fields(cls):
            sub = None
            if f.default_factory is not dataclasses.MISSING:
                inst = f.default_factory()
                if dataclasses.is_dataclass(inst):
                    sub = type(inst)
            yield prefix + f.name, f.name
            if sub is not None:
                yield from walk(sub, prefix + f.name + ".")

    dead = []
    for path, name in walk(cfgmod.EngineConfig):
        if not re.search(rf"\b{re.escape(name)}\b", source):
            dead.append(path)
    assert not dead, f"dead config keys (defined but never read): {dead}"
