"""Native runtime tests (ordered_multi_queue_test.cc / task_test.cc /
thread_pool analogs)."""

import threading
import time

import pytest

from dliom_tpu.native import OrderedMultiQueue, TaskThreadPool


def test_ordered_multi_queue_merges_in_time_order():
    q = OrderedMultiQueue(["imu", "points", "odom"])
    q.add("imu", 0.1, "i1")
    q.add("imu", 0.2, "i2")
    q.add("points", 0.15, "p1")
    # odom empty and unfinished -> nothing can dispatch yet
    assert q.dispatch() == []
    q.add("odom", 0.3, "o1")
    out = q.dispatch()
    # i2 blocks: `points` (empty, unfinished) could still get an item < 0.2
    assert [p for _, _, p in out] == ["i1", "p1"]
    assert q.dispatch() == []
    q.finish_queue("imu")
    q.finish_queue("points")
    out2 = q.dispatch()
    assert [p for _, _, p in out2] == ["i2", "o1"]


def test_ordered_multi_queue_drops_out_of_order():
    q = OrderedMultiQueue(["a"])
    assert q.add("a", 1.0, "x")
    assert not q.add("a", 0.5, "y")  # regression within the queue
    assert q.num_dropped == 1


def test_ordered_multi_queue_finished_queue_unblocks():
    q = OrderedMultiQueue(["a", "b"])
    q.add("a", 1.0, "a1")
    assert q.dispatch() == []
    q.finish_queue("b")
    assert [p for _, _, p in q.dispatch()] == ["a1"]


def test_thread_pool_runs_all_tasks():
    pool = TaskThreadPool(4)
    results = []
    lock = threading.Lock()
    for i in range(50):
        def fn(i=i):
            with lock:
                results.append(i)
        pool.add_task(fn)
    pool.wait_all()
    assert sorted(results) == list(range(50))
    assert pool.num_completed == 50
    pool.close()


def test_thread_pool_dependency_order():
    pool = TaskThreadPool(4)
    order = []
    lock = threading.Lock()

    def make(name):
        def fn():
            time.sleep(0.01)
            with lock:
                order.append(name)
        return fn

    a = pool.add_task(make("a"))
    b = pool.add_task(make("b"), depends_on=[a])
    c = pool.add_task(make("c"), depends_on=[a])
    d = pool.add_task(make("d"), depends_on=[b, c])
    pool.wait_all()
    assert order.index("a") < order.index("b")
    assert order.index("a") < order.index("c")
    assert order.index("d") == 3
    pool.close()


def test_thread_pool_propagates_exceptions():
    pool = TaskThreadPool(2)

    def boom():
        raise ValueError("task failed")

    pool.add_task(boom)
    with pytest.raises(ValueError, match="task failed"):
        pool.wait_all()
    pool.close()


def test_thread_pool_completed_dependency_is_satisfied():
    pool = TaskThreadPool(2)
    ran = []
    a = pool.add_task(lambda: ran.append("a"))
    pool.wait_all()
    b = pool.add_task(lambda: ran.append("b"), depends_on=[a])
    pool.wait_all()
    assert ran == ["a", "b"]
    pool.close()
