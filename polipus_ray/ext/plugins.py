"""Plugin protocol — the reference's 7 hook points
(reference lib/polipus/plugin.rb:5-12; dispatched at
lib/polipus.rb:156,173,182,201,218,250,264) mapped onto the wave
loop.  A plugin is any object implementing a subset of:

    on_initialize(engine)        engine construction
    on_crawl_start(engine)       before round 0
    on_message_received(engine)  each round, before the frontier read
    on_before_download(engine)   each round, before the fetch stage
    on_after_download(engine)    each round, after the fetch stage
    on_message_processed(engine) each round, after metrics
    on_crawl_end(engine)         after the last round

All hooks are driver-level (per-round, not per-message — the batch
engine has no per-message dispatch point); they receive the engine,
so they can read ``engine.metrics``, mutate ``engine.cfg`` between
rounds, or request a graceful stop.  Register via
``engine.plugins.append(plugin)``.
"""

from __future__ import annotations


class Plugin:
    """Optional base class (duck typing suffices)."""

    def on_initialize(self, engine):
        pass

    def on_crawl_start(self, engine):
        pass

    def on_message_received(self, engine):
        pass

    def on_before_download(self, engine):
        pass

    def on_after_download(self, engine):
        pass

    def on_message_processed(self, engine):
        pass

    def on_crawl_end(self, engine):
        pass


class SleeperPlugin(Plugin):
    """Reference plugins/sleeper.rb analogue: inject a politeness
    delay.  Instead of forcing workers=1 and sleeping the thread (the
    reference's approach), it sets the virtual politeness delay —
    per-host serialization is already guaranteed by host-bucket
    affinity."""

    def __init__(self, delay: float):
        self.delay = delay

    def on_initialize(self, engine):
        engine.cfg.politeness_default_delay = max(engine.cfg.politeness_default_delay, self.delay)
