"""htmlx — stdlib-only HTML parsing with bs4-compatible semantics.

The reference extractor is built on BeautifulSoup+lxml
(``crawler/extraction.py:50``, ``crawler/discovery.py:103-105``); this
sandbox has neither, so htmlx re-implements the *subset* of behavior the
reference relies on, on top of ``html.parser``:

* ``dom``     — tree building, ``get_text`` and ``str(elem)`` serialization
* ``select``  — a tiny CSS selector engine covering the 9 selector shapes
                the reference uses
* ``links``   — ``extract_links`` (reference ``crawler/discovery.py:92-120``)
* ``sections``— the 14-field section extractor
                (reference ``crawler/extraction.py:48-185``)
* ``udfs``    — Arrow-batched Spark UDF wrappers
"""

from ccr_web_crawler_spark.functions.htmlx.dom import Node, parse_html  # noqa: F401
from ccr_web_crawler_spark.functions.htmlx.select import select, select_one  # noqa: F401
