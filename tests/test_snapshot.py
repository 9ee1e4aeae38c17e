import numpy as np

from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.snapshot import (
    SceneSnapshotBuilder,
    apply_delta,
    decode_component_payload,
)
from oxylus_tpu.scene.state import SceneSpec


def networked_scene():
    s = Scene("net", spec=SceneSpec(max_entities=32))
    e = s.create_entity("player")
    e.add("TransformComponent", position=(1.0, 2.0, 3.0))
    e.add("SpriteComponent", layer=2)
    e.add("Networked")
    ghost = s.create_entity("ghost")  # not networked → never replicated
    ghost.add("TransformComponent")
    return s


def test_snapshot_only_networked_entities():
    s = networked_scene()
    b = SceneSnapshotBuilder()
    snap = b.take_snapshot(s)
    assert len(snap.entities) == 1
    e = next(iter(snap.entities.values()))
    assert e.name == "player"
    assert set(e.components) == {"TransformComponent", "SpriteComponent"}


def test_full_delta_then_empty_delta():
    s = networked_scene()
    b = SceneSnapshotBuilder()
    snap1 = b.take_snapshot(s)
    d1 = b.delta(snap1)
    assert d1.base_sequence == -1
    assert len(d1.created) == 1

    b.ack(snap1.sequence)
    snap2 = b.take_snapshot(s)
    d2 = b.delta(snap2)
    assert d2.base_sequence == snap1.sequence
    assert not d2.created and not d2.changed and not d2.removed


def test_changed_component_detected():
    s = networked_scene()
    b = SceneSnapshotBuilder()
    snap1 = b.take_snapshot(s)
    b.ack(snap1.sequence)

    player = s.entity("player")
    s.set_field(player.index, "TransformComponent", "position", (9.0, 9.0, 9.0))
    snap2 = b.take_snapshot(s)
    d = b.delta(snap2)
    assert list(d.changed.values())[0].keys() == {"TransformComponent"}
    payload = list(d.changed.values())[0]["TransformComponent"]
    decoded = decode_component_payload("TransformComponent", payload)
    np.testing.assert_allclose(decoded["position"], [9.0, 9.0, 9.0])


def test_removed_entity_detected():
    s = networked_scene()
    b = SceneSnapshotBuilder()
    snap1 = b.take_snapshot(s)
    b.ack(snap1.sequence)
    s.entity("player").destruct()
    snap2 = b.take_snapshot(s)
    d = b.delta(snap2)
    assert len(d.removed) == 1


def test_replication_roundtrip():
    src = networked_scene()
    b = SceneSnapshotBuilder()
    replica = Scene("replica", spec=SceneSpec(max_entities=32))

    snap1 = b.take_snapshot(src)
    emap = apply_delta(replica, b.delta(snap1))
    b.ack(snap1.sequence)
    p = replica.entity("player")
    assert p is not None
    np.testing.assert_allclose(p.get("TransformComponent")["position"], [1.0, 2.0, 3.0])
    assert replica.entity("ghost") is None

    # mutate + incremental delta
    src.set_field(src.entity("player").index, "TransformComponent", "position", (5.0, 0.0, 0.0))
    snap2 = b.take_snapshot(src)
    emap = apply_delta(replica, b.delta(snap2), emap)
    np.testing.assert_allclose(
        replica.entity("player").get("TransformComponent")["position"], [5.0, 0.0, 0.0]
    )

    # destroy + delta
    src.entity("player").destruct()
    b.ack(snap2.sequence)
    snap3 = b.take_snapshot(src)
    apply_delta(replica, b.delta(snap3), emap)
    assert replica.entity("player") is None


def test_ring_fallback_to_full_snapshot():
    s = networked_scene()
    b = SceneSnapshotBuilder()
    first = b.take_snapshot(s)
    b.ack(first.sequence)
    # push the acked snapshot out of the 32-entry ring
    for _ in range(40):
        snap = b.take_snapshot(s)
    d = b.delta(snap)
    assert d.base_sequence == -1  # fell back to full snapshot
    assert len(d.created) == 1
