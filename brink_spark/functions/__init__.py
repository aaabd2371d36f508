from brink_spark.functions.urls import (  # noqa: F401
    absolute_links_in,
    domain_key,
    links_in,
    normalize_url,
    parse_request_uri,
    path_forbidden,
    scheme_and_host,
    url_path,
)
