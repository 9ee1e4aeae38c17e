"""Core runtime tests, modeled on the reference's unit suites
(`Oxylus/tests/Core/TestEventSystem.cpp`, `TestJobManager.cpp`)."""

import dataclasses
import threading

import pytest

from oxylus_tpu.core.app import App, ModuleRegistry, Timestep
from oxylus_tpu.core.events import EventSystem
from oxylus_tpu.core.jobs import Barrier, JobManager
from oxylus_tpu.core.vfs import VFS
from oxylus_tpu.utils.slotmap import SlotMap, id_index, id_version


@dataclasses.dataclass
class Ping:
    value: int = 0


@dataclasses.dataclass
class Pong:
    value: int = 0


class TestEventSystem:
    def test_subscribe_emit(self):
        es = EventSystem()
        got = []
        es.subscribe(Ping, lambda e: got.append(e.value))
        assert es.emit(Ping(42)) == 1
        assert got == [42]

    def test_typed_dispatch(self):
        es = EventSystem()
        got = []
        es.subscribe(Ping, lambda e: got.append(("ping", e.value)))
        es.subscribe(Pong, lambda e: got.append(("pong", e.value)))
        es.emit(Pong(1))
        assert got == [("pong", 1)]

    def test_unsubscribe(self):
        es = EventSystem()
        got = []
        hid = es.subscribe(Ping, lambda e: got.append(e.value))
        assert es.unsubscribe(Ping, hid)
        assert not es.unsubscribe(Ping, hid)
        es.emit(Ping(1))
        assert got == []

    def test_multithreaded_emit(self):
        es = EventSystem()
        count = [0]
        lock = threading.Lock()

        def handler(e):
            with lock:
                count[0] += 1

        es.subscribe(Ping, handler)
        threads = [threading.Thread(target=lambda: [es.emit(Ping()) for _ in range(100)]) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert count[0] == 800


class TestJobManager:
    def test_submit_and_wait(self):
        jm = JobManager(workers=4)
        jm.init()
        fut = jm.submit(lambda: 21 * 2)
        assert fut.result() == 42
        jm.deinit()

    def test_barrier(self):
        jm = JobManager(workers=4)
        jm.init()
        results = []
        barrier = Barrier()
        for i in range(10):
            jm.submit(lambda i=i: results.append(i), barrier=barrier)
        barrier.wait()
        assert sorted(results) == list(range(10))
        jm.deinit()

    def test_for_each(self):
        jm = JobManager(workers=4)
        jm.init()
        out = jm.for_each(list(range(100)), lambda x: x * x)
        assert out == [x * x for x in range(100)]
        jm.deinit()

    def test_tracker(self):
        jm = JobManager(workers=2)
        jm.init()
        gate = threading.Event()
        jm.submit(lambda: gate.wait(2), name="slow-job")
        # the job is in flight until we release it
        assert "slow-job" in jm.tracker.active_jobs()
        gate.set()
        jm.deinit()
        assert jm.tracker.active_jobs() == []


class TestSlotMap:
    def test_create_get_destroy(self):
        sm: SlotMap[str] = SlotMap()
        sid = sm.create_slot("hello")
        assert sm.slot(sid) == "hello"
        assert sm.destroy_slot(sid)
        assert sm.slot(sid) is None
        assert not sm.destroy_slot(sid)

    def test_version_invalidates_stale_handle(self):
        sm: SlotMap[str] = SlotMap()
        sid1 = sm.create_slot("a")
        sm.destroy_slot(sid1)
        sid2 = sm.create_slot("b")
        assert id_index(sid1) == id_index(sid2)  # slot reused
        assert id_version(sid1) != id_version(sid2)
        assert sm.slot(sid1) is None  # stale handle rejected
        assert sm.slot(sid2) == "b"

    def test_len_and_items(self):
        sm: SlotMap[int] = SlotMap()
        ids = [sm.create_slot(i) for i in range(5)]
        sm.destroy_slot(ids[2])
        assert len(sm) == 4
        assert sorted(v for _, v in sm.items()) == [0, 1, 3, 4]


class TestVFS:
    def test_mount_resolve(self, tmp_path):
        vfs = VFS()
        vfs.mount_dir("proj", tmp_path)
        assert vfs.is_mounted("proj")
        assert vfs.resolve_physical_dir("proj", "scenes/a.json") == tmp_path / "scenes/a.json"
        assert vfs.resolve("proj://scenes/a.json") == tmp_path / "scenes/a.json"
        assert vfs.resolve_physical_dir("nope") is None
        vfs.unmount_dir("proj")
        assert not vfs.is_mounted("proj")


class CounterModule:
    MODULE_NAME = "Counter"

    def __init__(self):
        self.inits = 0
        self.updates = 0
        self.deinits = 0

    def init(self, app):
        self.inits += 1

    def update(self, app, ts):
        self.updates += 1

    def deinit(self, app):
        self.deinits += 1


class NeedsCounter:
    MODULE_NAME = "NeedsCounter"
    module_dependencies = (CounterModule,)

    def init(self, app):
        pass


class TestApp:
    def test_module_lifecycle(self):
        app = App().with_name("t")
        counter = CounterModule()
        app.with_module(counter)
        app.run(frames=3)
        assert counter.inits == 1
        assert counter.updates == 3
        assert counter.deinits == 1

    def test_dependency_ordering_enforced(self):
        app = App()
        with pytest.raises(RuntimeError):
            app.with_module(NeedsCounter())
        app.with_module(CounterModule())
        app.with_module(NeedsCounter())  # now fine

    def test_deferred_tasks_run_next_frame(self):
        app = App().with_module(CounterModule())
        ran = []
        app.defer_to_next_frame(lambda a: ran.append(1))
        app.run(frames=1)
        assert ran == [1]

    def test_mod_accessor(self):
        app = App()
        counter = CounterModule()
        app.with_module(counter)
        assert App.mod(CounterModule) is counter
        assert App.has_mod(CounterModule)

    def test_frame_callback_stops_loop(self):
        app = App().with_module(CounterModule())
        app.run(frame_callback=lambda a, ts: False)
        assert not app.is_running
