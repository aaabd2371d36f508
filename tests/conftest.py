import shutil

import pytest


@pytest.fixture(scope="session")
def spark():
    from brink_spark.session import get_spark

    s = get_spark(
        "local[8]",
        app_name="brink_spark_tests",
        shuffle_partitions=8,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_fixture():
    from brink_spark.sources.sitegen import generate_site

    return generate_site("tiny", 42)


MAX_WAVES = 8  # enough waves that every gate fires (robots first at wave 6)


def _test_config(fixture):
    # max_content_length=100 KB makes the C2 too-large gate fire on the
    # tiny fixture (the 512 KiB default never trips at this scale); with 8
    # waves every outcome is exercised: robots_denied/deferred/cached/miss/
    # not_allowed/too_large/malformed all > 0 per the oracle metrics.
    return fixture.config.with_(max_content_length=100_000, max_waves=MAX_WAVES)


@pytest.fixture(scope="session")
def tiny_oracle(tiny_fixture):
    from brink_spark.oracle import crawl_oracle

    return crawl_oracle(tiny_fixture, _test_config(tiny_fixture))


@pytest.fixture(scope="session")
def tiny_run(spark, tiny_fixture, tmp_path_factory):
    """One shared engine run (waves 0..MAX_WAVES-1) over the tiny fixture."""
    from brink_spark.plans.crawl import CrawlEngine

    store_dir = str(tmp_path_factory.mktemp("crawl") / "store")
    engine = CrawlEngine(spark, _test_config(tiny_fixture), store_dir)
    summary = engine.run(fixture=tiny_fixture, max_waves=MAX_WAVES)
    yield engine, summary
    shutil.rmtree(store_dir, ignore_errors=True)
