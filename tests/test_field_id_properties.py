"""Property tests for the r10 evolution-publish machinery: stable field
ids (``align_field_ids``) and spec-valid name mappings
(``name_mapping_from_ops``) under RANDOM add/rename/drop sequences that
honor the engine's own journal guards (``_reserved_names``: a
renamed-away or dropped name may not come back while the journal is
live; rename targets must be fresh).

Invariants (Iceberg table spec, "Schema Evolution" / name mapping):
- a field id is the column's identity: across any number of publishes,
  an id maps to exactly ONE column (tracked by a uid assigned at
  add-time), and a surviving column never changes id;
- new columns always take ids above every id ever assigned (no reuse of
  retired ids);
- the name mapping never lists a physical name under two field ids, and
  its first name is always the field's current name.

r11: the strategy also draws MATERIALIZE steps (journal reset — the
``materialize_schema()`` physical rewrite), which unlock re-ADDING a
previously dropped or renamed-away name. A re-added name is a NEW
column (new uid), so the uid-identity invariants above now cover the
ADVICE r10 #1 reuse bug directly: pre-fix, ``align_field_ids``'s
history fallback handed the re-added column the retired id on a newest
publish, failing the "new column never reuses a retired id" assertion.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from philotes_spark.sources.catalog_rest import (
    align_field_ids,
    name_mapping_from_ops,
)

_NAMES = [f"c{i}" for i in range(20)]


@st.composite
def evolution(draw):
    """A journal-guard-respecting random evolution: start with 2-5
    columns, apply 0-12 interleaved add/rename/drop/publish steps."""
    n0 = draw(st.integers(2, 5))
    cols = [(i, _NAMES[i]) for i in range(n0)]  # (uid, current name)
    next_uid = n0
    reserved: set[str] = set()  # rename sources + dropped (journal live)
    published: set[str] = {n for _, n in cols}  # last SERVED current names
    ops: list[dict] = []
    steps: list[tuple] = [("base", n0), ("publish",)]
    for _ in range(draw(st.integers(0, 12))):
        kinds = ["publish", "add", "materialize"]
        if cols:
            kinds += ["rename", "drop"]
        kind = draw(st.sampled_from(kinds))
        current = {n for _, n in cols}
        # fresh-name pool: not currently held, not journal-reserved, and
        # not in the last PUBLISHED schema — after a materialize (journal
        # reset) a name whose drop was published becomes available again
        # (the re-add case); a name whose drop was NEVER published stays
        # off-limits because the catalog only has name identity: it would
        # correctly bind the re-add to the still-served id, which the
        # uid model here would miscount as reuse
        fresh = [
            n for n in _NAMES
            if n not in current and n not in reserved and n not in published
        ]
        if kind == "publish":
            published = set(current)
            steps.append(("publish",))
        elif kind == "materialize":
            ops.clear()
            reserved.clear()
            steps.append(("materialize",))
        elif kind == "add":
            if not fresh:
                continue
            name = draw(st.sampled_from(fresh))
            cols.append((next_uid, name))
            next_uid += 1
            ops.append({"op": "add", "name": name, "type": "string"})
            steps.append(("add", name))
        elif kind == "rename":
            idx = draw(st.integers(0, len(cols) - 1))
            if not fresh:
                continue
            new = draw(st.sampled_from(fresh))
            uid, old = cols[idx]
            cols[idx] = (uid, new)
            reserved.add(old)
            ops.append({"op": "rename", "from": old, "to": new})
            steps.append(("rename", old, new))
        else:  # drop
            if len(cols) == 1:
                continue
            idx = draw(st.integers(0, len(cols) - 1))
            uid, name = cols.pop(idx)
            reserved.add(name)
            ops.append({"op": "drop", "name": name})
            steps.append(("drop", name))
    steps.append(("publish",))
    return steps


def _positional(cols: list[tuple[int, str]]) -> dict:
    return {
        "type": "struct",
        "fields": [
            {"id": i + 1, "name": n, "required": False, "type": "string"}
            for i, (_, n) in enumerate(cols)
        ],
    }


@given(evolution())
@settings(max_examples=200, deadline=None)
def test_field_ids_are_stable_column_identities(steps):
    cols: list[tuple[int, str]] = []
    ops: list[dict] = []
    served_schemas: list[dict] = []
    id_of_uid: dict[int, int] = {}
    ids_ever: set[int] = set()
    pub_name_of_uid: dict[int, str] = {}  # name at the LAST publish

    # replay the evolution, publishing at the checkpoints
    uid_counter = 0
    n_publishes = 0
    for step in steps:
        if step[0] == "base":
            cols = [(i, _NAMES[i]) for i in range(step[1])]
            uid_counter = step[1]
        elif step[0] == "add":
            cols.append((uid_counter, step[1]))
            uid_counter += 1
            ops.append({"op": "add", "name": step[1], "type": "string"})
        elif step[0] == "rename":
            _, old, new = step
            cols = [
                (u, new if n == old else n) for u, n in cols
            ]
            ops.append({"op": "rename", "from": old, "to": new})
        elif step[0] == "drop":
            name = step[1]
            cols = [(u, n) for u, n in cols if n != name]
            ops.append({"op": "drop", "name": name})
        elif step[0] == "materialize":
            # journal reset — names become physically current. A column
            # whose rename was never PUBLISHED loses its external
            # identity here: the catalog only ever saw the old name, the
            # reset erases the alias evidence, so the next publish
            # rightly treats the new name as a new column (fresh id) and
            # the old name as implicitly dropped. Model that as a fresh
            # uid; columns whose served name matches keep their identity.
            ops = []
            new_cols = []
            for u, n in cols:
                if u in id_of_uid and pub_name_of_uid.get(u) != n:
                    new_cols.append((uid_counter, n))
                    uid_counter += 1
                else:
                    new_cols.append((u, n))
            cols = new_cols
        else:  # publish
            assert cols, "evolution() keeps at least one column"
            n_publishes += 1
            want = _positional(cols)
            if not served_schemas:
                aligned = want  # fresh table: positional ids ARE the ids
            else:
                last_col = max(
                    (f["id"] for s in served_schemas for f in s["fields"]),
                    default=0,
                )
                aligned = align_field_ids(
                    want,
                    {
                        "schemas": [
                            {**s, "schema-id": i}
                            for i, s in enumerate(served_schemas)
                        ],
                        "current-schema-id": len(served_schemas) - 1,
                        "last-column-id": last_col,
                    },
                    ops,
                )
            prev_last = max(ids_ever, default=0)
            seen_ids = set()
            for (uid, name), f in zip(cols, aligned["fields"]):
                assert f["name"] == name
                assert f["id"] not in seen_ids, "duplicate id in one schema"
                seen_ids.add(f["id"])
                if uid in id_of_uid:
                    # identity: a surviving column NEVER changes id
                    assert f["id"] == id_of_uid[uid], (
                        f"column uid={uid} ({name}) moved from "
                        f"{id_of_uid[uid]} to {f['id']}"
                    )
                else:
                    # a new column never reuses a retired id
                    assert f["id"] not in ids_ever, (
                        f"id {f['id']} reused for new column {name}"
                    )
                    assert f["id"] > prev_last or not served_schemas
                    id_of_uid[uid] = f["id"]
                ids_ever.add(f["id"])
            pub_name_of_uid = {u: n for u, n in cols}
            served_schemas.append(aligned)

            # name-mapping invariants on the published schema
            mapping = name_mapping_from_ops(aligned, ops)
            assert [e["field-id"] for e in mapping] == [
                f["id"] for f in aligned["fields"]
            ]
            flat = [n for e in mapping for n in e["names"]]
            assert len(flat) == len(set(flat)), f"duplicate names: {flat}"
            for e, f in zip(mapping, aligned["fields"]):
                assert e["names"][0] == f["name"]

    assert n_publishes >= 2  # base publish + final checkpoint ran
