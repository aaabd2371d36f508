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


MAX_WAVES = 6  # partial crawl keeps the e2e suite fast; resume test goes deeper


@pytest.fixture(scope="session")
def tiny_oracle(tiny_fixture):
    from brink_spark.oracle import crawl_oracle

    return crawl_oracle(
        tiny_fixture, tiny_fixture.config.with_(max_waves=MAX_WAVES)
    )


@pytest.fixture(scope="session")
def tiny_run(spark, tiny_fixture, tmp_path_factory):
    """One shared engine run (waves 0..MAX_WAVES-1) over the tiny fixture."""
    from brink_spark.plans.crawl import CrawlEngine

    store_dir = str(tmp_path_factory.mktemp("crawl") / "store")
    engine = CrawlEngine(spark, tiny_fixture.config, store_dir)
    summary = engine.run(fixture=tiny_fixture, max_waves=MAX_WAVES)
    yield engine, summary
    shutil.rmtree(store_dir, ignore_errors=True)
