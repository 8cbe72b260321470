"""Wall-clock token bucket: rate bounds under a fake clock (no sleeping)."""

from scraper_ray.state.ratelimit import WallClockTokenBucket


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_burst_then_rate():
    clk = FakeClock()
    tb = WallClockTokenBucket(rate_per_sec=2.0, burst=5.0, clock=clk)
    # burst available immediately
    assert sum(tb.try_acquire("h") for _ in range(10)) == 5
    # after 1s, 2 more tokens
    clk.t = 1.0
    assert sum(tb.try_acquire("h") for _ in range(10)) == 2
    # never exceeds burst even after a long idle
    clk.t = 100.0
    assert sum(tb.try_acquire("h") for _ in range(10)) == 5


def test_hosts_independent():
    clk = FakeClock()
    tb = WallClockTokenBucket(1.0, 1.0, clock=clk)
    assert tb.try_acquire("a")
    assert tb.try_acquire("b")  # b has its own bucket
    assert not tb.try_acquire("a")


def test_wait_time_and_long_run_bound():
    clk = FakeClock()
    tb = WallClockTokenBucket(rate_per_sec=4.0, burst=2.0, clock=clk)
    taken = 0
    # simulate 10 seconds in 0.1s steps, taking greedily
    for step in range(100):
        clk.t = step * 0.1
        while tb.try_acquire("h"):
            taken += 1
    # bound: burst + rate * elapsed
    assert taken <= 2 + 4 * 9.9 + 1
    assert taken >= 4 * 9.0  # and we actually sustained close to the rate
    assert tb.wait_time("h") > 0.0
