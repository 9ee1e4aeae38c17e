"""Networking tests, modeled on the reference's socket-free packet round-trips
(`Oxylus/tests/Networking/TestNetPacket.cpp`) plus a real loopback UDP exchange."""

import time

import numpy as np
import pytest

from oxylus_tpu.network.manager import NetClient, NetServer, NetworkManager
from oxylus_tpu.network.packet import (
    RPC,
    ClientAck,
    Disconnect,
    Handshake,
    SceneSnapshotPacket,
    decode_packet,
    encode_packet,
    fnv1a64,
)
from oxylus_tpu.network.wire import pack_value, unpack_value
from oxylus_tpu.scene.scene import Scene
from oxylus_tpu.scene.snapshot import SceneSnapshotBuilder
from oxylus_tpu.scene.state import SceneSpec


class TestWire:
    def test_scalars(self):
        for v in (None, True, False, 0, -5, 2**40, 3.25, "héllo", b"\x00\xff"):
            assert unpack_value(pack_value(v)) == v

    def test_containers(self):
        v = {"a": [1, 2.5, "x", None], "b": {"nested": [True]}, "n": 7}
        assert unpack_value(pack_value(v)) == v

    def test_ndarray(self):
        arr = np.arange(12, dtype=np.float32).reshape(3, 4)
        out = unpack_value(pack_value({"arr": arr}))["arr"]
        np.testing.assert_array_equal(out, arr)
        assert out.dtype == np.float32

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            unpack_value(b"\xfe\x01\x02")


class TestPackets:
    def test_handshake_roundtrip(self):
        pkt = decode_packet(encode_packet(Handshake(client_name="alice")))
        assert isinstance(pkt, Handshake)
        assert pkt.client_name == "alice"

    def test_ack_roundtrip(self):
        pkt = decode_packet(encode_packet(ClientAck(sequence=42)))
        assert pkt.sequence == 42

    def test_rpc_roundtrip(self):
        rpc = RPC.call("spawn_player", "alice", 3, [1.0, 2.0], rpc_id=9)
        out = decode_packet(encode_packet(rpc))
        assert out.name_hash == fnv1a64("spawn_player")
        assert out.params == ["alice", 3, [1.0, 2.0]]
        assert out.rpc_id == 9

    def test_snapshot_packet_roundtrip(self):
        s = Scene("net", spec=SceneSpec(max_entities=16))
        e = s.create_entity("p")
        e.add("TransformComponent", position=(1.0, 2.0, 3.0))
        e.add("Networked")
        b = SceneSnapshotBuilder()
        delta = b.delta(b.take_snapshot(s))
        out = decode_packet(encode_packet(SceneSnapshotPacket(delta)))
        assert out.delta.sequence == delta.sequence
        assert out.delta.base_sequence == -1
        assert list(out.delta.created.values())[0]["name"] == "p"

    def test_disconnect(self):
        assert decode_packet(encode_packet(Disconnect("bye"))).reason == "bye"

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError):
            decode_packet(b"\x00\x00\x00\x01hello")


def pump(*hosts, times=8):
    for _ in range(times):
        for h in hosts:
            h.service()
        time.sleep(0.005)


class TestLoopback:
    def test_connect_rpc_and_replicate(self):
        mgr = NetworkManager()
        server = mgr.create_server()
        client = mgr.create_client("127.0.0.1", server.port, name="alice")

        calls = []
        server.register_rpc("shoot", lambda peer, x, y: calls.append((x, y)))

        pump(server, client)
        assert client.connected
        assert len(server.peers) == 1
        peer = next(iter(server.peers.values()))
        assert peer.name == "alice"

        client.rpc("shoot", 1.5, 2.5)
        pump(server, client)
        assert calls == [(1.5, 2.5)]

        # replicate a scene to the client
        src = Scene("world", spec=SceneSpec(max_entities=16))
        e = src.create_entity("npc")
        e.add("TransformComponent", position=(7.0, 8.0, 9.0))
        e.add("Networked")
        replica = Scene("replica", spec=SceneSpec(max_entities=16))
        client.replica_scene = replica

        server.replicate(src)
        pump(server, client)
        npc = replica.entity("npc")
        assert npc is not None
        np.testing.assert_allclose(npc.get("TransformComponent")["position"], [7.0, 8.0, 9.0])

        # ack flowed back → next delta is empty but still applies cleanly
        src.set_field(e.index, "TransformComponent", "position", (1.0, 1.0, 1.0))
        server.replicate(src)
        pump(server, client)
        np.testing.assert_allclose(
            replica.entity("npc").get("TransformComponent")["position"], [1.0, 1.0, 1.0]
        )
        mgr.deinit()

    def test_reliable_rpc_dedup(self):
        mgr = NetworkManager()
        server = mgr.create_server()
        client = mgr.create_client("127.0.0.1", server.port)
        got = []
        server.register_rpc("hit", lambda peer, n: got.append(n))
        pump(server, client)
        rid = client.rpc("hit", 1)
        assert rid == 1
        pump(server, client)
        # client should have received the ack → pending cleared
        assert client.server.pending_rpcs == {}
        assert got == [1]
        mgr.deinit()

    def test_disconnect_event(self):
        mgr = NetworkManager()
        server = mgr.create_server()
        dropped = []
        server.on_peer_disconnected = lambda peer: dropped.append(peer.name)
        client = mgr.create_client("127.0.0.1", server.port, name="bob")
        pump(server, client)
        client.close()
        mgr.clients.remove(client)
        pump(server)
        assert dropped == ["bob"]
        mgr.deinit()
