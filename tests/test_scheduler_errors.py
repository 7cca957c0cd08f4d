"""WaveRunner failure semantics: errors propagate, no deadlocks."""
import pytest

pytestmark = pytest.mark.quick

from llmrankers_tpu.algos import WaveRunner, setwise_sort


def test_batch_fn_exception_propagates():
    def bad_batch(reqs):
        raise RuntimeError("device OOM")

    runner = WaveRunner(bad_batch)

    async def compare(docs):
        return await runner.compare(docs)

    with pytest.raises(RuntimeError, match="device OOM"):
        runner.run([setwise_sort.heapsort(runner, [3, 1, 2], 2, 2, compare)])


def test_coroutine_exception_propagates_while_others_blocked():
    runner = WaveRunner(lambda reqs: [0 for _ in reqs])

    async def fine(docs):
        return await runner.compare(docs)

    async def crasher():
        raise ValueError("bad ranker state")

    with pytest.raises(ValueError, match="bad ranker state"):
        runner.run([
            setwise_sort.heapsort(runner, list(range(20)), 3, 2, fine),
            crasher(),
        ])


def test_wrong_outcome_count_detected():
    runner = WaveRunner(lambda reqs: [0])  # always one outcome

    async def compare(docs):
        return await runner.compare(docs)

    with pytest.raises(RuntimeError, match="outcomes"):
        runner.run([
            setwise_sort.heapsort(runner, list(range(30)), 5, 2, compare)
        ])


def test_empty_run():
    runner = WaveRunner(lambda reqs: [0 for _ in reqs])
    assert runner.run([]) == []
