"""JSON-schema -> GBNF compiler tests.

Role parity with examples/json-schema-to-grammar.py (the reference tool
that constrains generation to a JSON schema); our compiler additionally
honors `required`, `$ref`/`$defs` recursion, `prefixItems`, string length
bounds and type unions. Every grammar is validated operationally: the
compiled GBNF is fed through the real grammar engine and strings are
accepted/rejected byte-by-byte; a seeded random walk additionally
generates documents straight from the grammar and checks they parse as
schema-conforming JSON.
"""

import json
import random

import pytest

from tpulamm.grammar.engine import Grammar
from tpulamm.grammar.gbnf import parse_gbnf
from tpulamm.grammar.json_schema import json_grammar, schema_to_grammar


def _accepts(g_text: str, s: str) -> bool:
    g = Grammar.from_gbnf(g_text)
    try:
        for ch in s:
            g.accept_token(ch.encode("utf-8"))
    except AssertionError:
        return False
    return g.can_stop()


def _gen(g_text: str, seed: int, max_len: int = 400) -> str:
    """Generate a document by walking the grammar with random allowed
    bytes (printable ASCII candidate set)."""
    g = Grammar.from_gbnf(g_text)
    rng = random.Random(seed)
    candidates = {i: bytes([i]) for i in range(0x20, 0x7F)}
    out = []
    for _ in range(max_len):
        if g.can_stop() and (out and rng.random() < 0.6):
            break
        rejected = set(g.reject_tokens(candidates))
        allowed = [b for i, b in candidates.items() if i not in rejected]
        if not allowed:
            assert g.can_stop(), "walk stuck in non-accepting state"
            break
        # bias against opening new nesting so the walk terminates
        pick = sorted(allowed)[: max(1, len(allowed) - 2)] \
            if len(out) > max_len // 2 else allowed
        b = rng.choice(pick)
        g.accept_token(b)
        out.append(b)
    assert g.can_stop(), "generation did not reach an accepting state"
    return b"".join(out).decode()


PERSON = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "tags": {"type": "array", "items": {"type": "string"}},
    },
    "required": ["name", "age"],
}


def test_primitives():
    for schema, good, bad in [
        ({"type": "integer"}, "-12", "1.5"),
        ({"type": "number"}, "3.25e-2", "03"),
        ({"type": "boolean"}, "true", "True"),
        ({"type": "null"}, "null", ""),
        ({"type": "string"}, '"he\\nllo"', '"unterminated'),
    ]:
        g = schema_to_grammar(schema)
        parse_gbnf(g)                       # well-formed GBNF
        assert _accepts(g, good), (schema, good)
        assert not _accepts(g, bad), (schema, bad)


def test_object_required_and_optional():
    g = schema_to_grammar(PERSON)
    assert _accepts(g, '{"name": "ada", "age": 36}')
    assert _accepts(g, '{"name": "ada", "age": 36, "tags": ["x", "y"]}')
    assert _accepts(g, '{"name": "a", "age": 1, "tags": []}')
    # missing required / extra prop / wrong order are rejected
    assert not _accepts(g, '{"age": 36}')
    assert not _accepts(g, '{"name": "ada"}')
    assert not _accepts(g, '{"name": "a", "age": 1, "zz": 2}')
    assert not _accepts(g, '{"age": 36, "name": "ada"}')


def test_object_all_optional():
    g = schema_to_grammar({
        "type": "object",
        "properties": {"a": {"type": "integer"},
                       "b": {"type": "boolean"},
                       "c": {"type": "null"}},
        "required": [],
    })
    for s in ('{}', '{"a": 1}', '{"b": true}', '{"a": 1, "c": null}',
              '{"b": false, "c": null}', '{"a": 0, "b": true, "c": null}'):
        assert _accepts(g, s), s
    assert not _accepts(g, '{"c": null, "a": 1}')   # fixed order
    assert not _accepts(g, '{"a": 1,}')


def test_enum_const_union():
    g = schema_to_grammar({"enum": ["red", "green", 7, None]})
    for s in ('"red"', '"green"', "7", "null"):
        assert _accepts(g, s)
    assert not _accepts(g, '"blue"')
    g = schema_to_grammar({"const": {"k": [1, 2]}})
    assert _accepts(g, '{"k": [1, 2]}')
    assert not _accepts(g, '{"k": [1]}')
    g = schema_to_grammar({"type": ["string", "null"]})
    assert _accepts(g, '"x"') and _accepts(g, "null")
    assert not _accepts(g, "3")


def test_oneof_allof():
    g = schema_to_grammar({"oneOf": [{"type": "integer"},
                                     {"type": "boolean"}]})
    assert _accepts(g, "3") and _accepts(g, "false")
    assert not _accepts(g, '"s"')
    g = schema_to_grammar({"allOf": [
        {"type": "object", "properties": {"a": {"type": "integer"}},
         "required": ["a"]},
        {"type": "object", "properties": {"b": {"type": "boolean"}},
         "required": ["b"]},
    ]})
    assert _accepts(g, '{"a": 1, "b": true}')
    assert not _accepts(g, '{"a": 1}')


def test_ref_recursion():
    g = schema_to_grammar({
        "$defs": {"node": {
            "type": "object",
            "properties": {"v": {"type": "integer"},
                           "next": {"oneOf": [{"$ref": "#/$defs/node"},
                                              {"type": "null"}]}},
            "required": ["v", "next"],
        }},
        "$ref": "#/$defs/node",
    })
    assert _accepts(g, '{"v": 1, "next": null}')
    assert _accepts(g, '{"v": 1, "next": {"v": 2, "next": null}}')
    assert not _accepts(g, '{"v": 1}')


def test_array_bounds_prefix():
    g = schema_to_grammar({"type": "array", "items": {"type": "integer"},
                           "minItems": 2, "maxItems": 3})
    assert not _accepts(g, "[1]")
    assert _accepts(g, "[1, 2]") and _accepts(g, "[1, 2, 3]")
    assert not _accepts(g, "[1, 2, 3, 4]")
    g = schema_to_grammar({"prefixItems": [{"type": "integer"},
                                           {"type": "boolean"}]})
    assert _accepts(g, "[1, true]")
    assert not _accepts(g, "[true, 1]")
    g = schema_to_grammar({"type": "array", "items": {"type": "null"},
                           "maxItems": 1})
    assert _accepts(g, "[]") and _accepts(g, "[null]")
    assert not _accepts(g, "[null, null]")


def test_string_length_bounds():
    g = schema_to_grammar({"type": "string", "minLength": 2,
                           "maxLength": 4})
    assert not _accepts(g, '"a"')
    assert _accepts(g, '"ab"') and _accepts(g, '"abcd"')
    assert not _accepts(g, '"abcde"')


def test_free_form_json():
    g = json_grammar()
    for s in ('{"a": [1, {"b": null}], "c": "x"}', "[]", '"s"', "3.5",
              "true"):
        assert _accepts(g, s), s
    assert not _accepts(g, "{broken}")


@pytest.mark.parametrize("seed", range(4))
def test_random_walk_conforms(seed):
    g = schema_to_grammar(PERSON)
    doc = json.loads(_gen(g, seed))
    assert isinstance(doc["name"], str)
    assert isinstance(doc["age"], int) and not isinstance(doc["age"], bool)
    if "tags" in doc:
        assert all(isinstance(t, str) for t in doc["tags"])


@pytest.mark.parametrize("seed", range(3))
def test_random_walk_free_json(seed):
    json.loads(_gen(json_grammar(), seed + 10))


def test_dedup_and_cli(tmp_path, capsys):
    # identical sub-schemas collapse to one rule
    g = schema_to_grammar({
        "type": "object",
        "properties": {"a": {"type": "array", "items": {"type": "integer"}},
                       "b": {"type": "array", "items": {"type": "integer"}}},
    })
    assert g.count('"[" space') == 1
    from tpulamm.grammar.json_schema import main
    f = tmp_path / "s.json"
    f.write_text(json.dumps(PERSON))
    assert main([str(f), "--prop-order", "age,name"]) == 0
    out = capsys.readouterr().out
    parse_gbnf(out)
    assert _accepts(out, '{"age": 3, "name": "b"}')
    assert not _accepts(out, '{"name": "b", "age": 3}')


def test_ref_name_collision_keeps_recursion_separate():
    """Two refs whose last segment collides: each recursion must point at
    its own definition (review finding: pre-registration collided)."""
    g = schema_to_grammar({
        "definitions": {"item": {"type": "object",
                                 "properties": {"a": {"type": "integer"}},
                                 "required": ["a"]}},
        "$defs": {"item": {
            "type": "object",
            "properties": {"v": {"type": "boolean"},
                           "next": {"oneOf": [{"$ref": "#/$defs/item"},
                                              {"type": "null"}]}},
            "required": ["v", "next"]}},
        "type": "object",
        "properties": {"x": {"$ref": "#/definitions/item"},
                       "y": {"$ref": "#/$defs/item"}},
        "required": ["x", "y"],
    })
    parse_gbnf(g)
    ok = ('{"x": {"a": 3}, '
          '"y": {"v": true, "next": {"v": false, "next": null}}}')
    assert _accepts(g, ok)
    # recursion must NOT accept the other definition's shape
    bad = '{"x": {"a": 3}, "y": {"v": true, "next": {"a": 1}}}'
    assert not _accepts(g, bad)


def test_bad_refs_raise_valueerror():
    for schema in ({"allOf": [{"$ref": "#/nope"}]},
                   {"$ref": "#/missing/deep"},
                   {"$ref": "http://remote#/x"}):
        with pytest.raises(ValueError):
            schema_to_grammar(schema)
