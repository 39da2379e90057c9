// Native runtime for dliom_tpu: sensor collation + task-DAG thread pool.
//
// C++ counterpart of the reference's host runtime:
//   * OrderedMultiQueue / Collator (cartographer/sensor/internal/
//     ordered_multi_queue.{h,cc}): per-sensor queues merged by timestamp;
//     an item dispatches only once every other unfinished queue holds a
//     later item, so cross-sensor ordering is total.
//   * ThreadPool + Task dependency DAG (cartographer/common/thread_pool.
//     {h,cc}, common/task.h: states NEW -> DISPATCHED ->
//     DEPENDENCIES_COMPLETED -> RUNNING -> COMPLETED): background execution
//     of constraint-search work with explicit dependencies.
//
// Exposed as a plain C ABI consumed from Python via ctypes (payloads stay in
// Python; the native side orders/schedules opaque int64 handles).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <deque>
#include <map>
#include <mutex>
#include <queue>
#include <thread>
#include <unordered_map>
#include <vector>

// ---------------------------------------------------------------------------
// OrderedMultiQueue
// ---------------------------------------------------------------------------

namespace {

struct Item {
  double time;
  int64_t handle;
};

struct MultiQueue {
  std::vector<std::deque<Item>> queues;
  std::vector<bool> finished;
  std::vector<double> last_dispatched;  // per-queue monotonicity check
  std::mutex mu;
  int64_t dropped = 0;  // out-of-order items dropped (reference CHECKs)
};

}  // namespace

extern "C" {

void* omq_create(int num_queues) {
  auto* q = new MultiQueue();
  q->queues.resize(num_queues);
  q->finished.assign(num_queues, false);
  q->last_dispatched.assign(num_queues, -1e300);
  return q;
}

void omq_destroy(void* p) { delete static_cast<MultiQueue*>(p); }

// Returns 1 if accepted, 0 if dropped (out of order within its queue).
int omq_add(void* p, int queue, double time, int64_t handle) {
  auto* q = static_cast<MultiQueue*>(p);
  std::lock_guard<std::mutex> lock(q->mu);
  if (queue < 0 || queue >= (int)q->queues.size() || q->finished[queue]) {
    ++q->dropped;
    return 0;
  }
  auto& dq = q->queues[queue];
  if (!dq.empty() && time < dq.back().time) {
    ++q->dropped;  // within-queue order violation
    return 0;
  }
  dq.push_back(Item{time, handle});
  return 1;
}

void omq_finish_queue(void* p, int queue) {
  auto* q = static_cast<MultiQueue*>(p);
  std::lock_guard<std::mutex> lock(q->mu);
  if (queue >= 0 && queue < (int)q->finished.size()) q->finished[queue] = true;
}

int64_t omq_num_dropped(void* p) {
  auto* q = static_cast<MultiQueue*>(p);
  std::lock_guard<std::mutex> lock(q->mu);
  return q->dropped;
}

// Dispatch up to `max` items in global time order. An item at the head of
// queue i is dispatchable iff every other unfinished queue is non-empty
// (so no earlier item can still arrive) — OrderedMultiQueue::Dispatch logic.
int omq_dispatch(void* p, int64_t* out_handles, int* out_queues,
                 double* out_times, int max) {
  auto* q = static_cast<MultiQueue*>(p);
  std::lock_guard<std::mutex> lock(q->mu);
  int n = 0;
  while (n < max) {
    int best = -1;
    double best_time = 0;
    bool blocked = false;
    for (int i = 0; i < (int)q->queues.size(); ++i) {
      if (q->queues[i].empty()) {
        if (!q->finished[i]) {
          blocked = true;  // an earlier item could still arrive here
          break;
        }
        continue;
      }
      const Item& it = q->queues[i].front();
      if (best < 0 || it.time < best_time) {
        best = i;
        best_time = it.time;
      }
    }
    if (blocked || best < 0) break;
    const Item it = q->queues[best].front();
    q->queues[best].pop_front();
    q->last_dispatched[best] = it.time;
    out_handles[n] = it.handle;
    out_queues[n] = best;
    out_times[n] = it.time;
    ++n;
  }
  return n;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// ThreadPool with task dependency DAG
// ---------------------------------------------------------------------------

namespace {

typedef void (*TaskFn)(int64_t user_data);

enum TaskState { NEW = 0, BLOCKED = 1, READY = 2, RUNNING = 3, COMPLETED = 4 };

struct Task {
  TaskFn fn;
  int64_t user_data;
  std::atomic<int> unfinished_deps{0};
  std::vector<int64_t> dependents;
  TaskState state = NEW;
};

struct Pool {
  std::vector<std::thread> workers;
  std::deque<int64_t> ready;
  std::unordered_map<int64_t, Task*> tasks;
  std::mutex mu;
  std::condition_variable cv;
  std::condition_variable cv_done;
  int64_t next_id = 1;
  int64_t num_completed = 0;
  int64_t num_added = 0;
  bool shutting_down = false;

  void worker_loop() {
    for (;;) {
      int64_t id;
      Task* task;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv.wait(lock, [this] { return shutting_down || !ready.empty(); });
        if (shutting_down && ready.empty()) return;
        id = ready.front();
        ready.pop_front();
        task = tasks[id];
        task->state = RUNNING;
      }
      task->fn(task->user_data);
      {
        std::unique_lock<std::mutex> lock(mu);
        task->state = COMPLETED;
        ++num_completed;
        for (int64_t dep_id : task->dependents) {
          Task* d = tasks[dep_id];
          if (d->unfinished_deps.fetch_sub(1) == 1) {
            d->state = READY;
            ready.push_back(dep_id);
            cv.notify_one();
          }
        }
        cv_done.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

void* pool_create(int threads) {
  auto* p = new Pool();
  for (int i = 0; i < threads; ++i) {
    p->workers.emplace_back([p] { p->worker_loop(); });
  }
  return p;
}

void pool_destroy(void* ptr) {
  auto* p = static_cast<Pool*>(ptr);
  {
    std::lock_guard<std::mutex> lock(p->mu);
    p->shutting_down = true;
  }
  p->cv.notify_all();
  for (auto& t : p->workers) t.join();
  for (auto& kv : p->tasks) delete kv.second;
  delete p;
}

// Add a task with dependencies (ids of previously added tasks). Completed
// dependencies count as satisfied. Returns the task id.
int64_t pool_add_task(void* ptr, TaskFn fn, int64_t user_data,
                      const int64_t* deps, int num_deps) {
  auto* p = static_cast<Pool*>(ptr);
  std::lock_guard<std::mutex> lock(p->mu);
  int64_t id = p->next_id++;
  auto* t = new Task();
  t->fn = fn;
  t->user_data = user_data;
  int pending = 0;
  for (int i = 0; i < num_deps; ++i) {
    auto it = p->tasks.find(deps[i]);
    if (it == p->tasks.end()) continue;  // unknown == completed+pruned
    if (it->second->state != COMPLETED) {
      it->second->dependents.push_back(id);
      ++pending;
    }
  }
  t->unfinished_deps.store(pending);
  p->tasks[id] = t;
  ++p->num_added;
  if (pending == 0) {
    t->state = READY;
    p->ready.push_back(id);
    p->cv.notify_one();
  } else {
    t->state = BLOCKED;
  }
  return id;
}

// Block until every added task has completed.
void pool_wait_all(void* ptr) {
  auto* p = static_cast<Pool*>(ptr);
  std::unique_lock<std::mutex> lock(p->mu);
  p->cv_done.wait(lock, [p] { return p->num_completed == p->num_added; });
}

int64_t pool_num_completed(void* ptr) {
  auto* p = static_cast<Pool*>(ptr);
  std::lock_guard<std::mutex> lock(p->mu);
  return p->num_completed;
}

}  // extern "C"
