"""Realistic page-shape fixtures: common real-world layouts with
hand-specified expected main text (byte-identical). These go beyond the
synth chrome — comments sections, inline ads mid-article, docs TOC,
newsletter interstitials, cookie walls."""

from __future__ import annotations

import pytest

from ocr_spark.kernels.html import extract_main_text

CASES = [
    (
        "blog post with comments section",
        """<body>
        <header class="site-header"><a href="/">My Blog</a></header>
        <article>
        <h1>Why pipelines fail at scale</h1>
        <p>The first reason pipelines fail is that partition keys are chosen before the data is understood, and the hot keys only show up in production traffic.</p>
        <p>The second reason is shuffle amplification: every innocent groupBy doubles the bytes in flight until the cluster spends more time moving data than computing on it.</p>
        </article>
        <section class="comments"><h3>Comments</h3>
          <div class="comment"><a href="/u/1">dave42</a> great post!</div>
          <div class="comment"><a href="/u/2">ana</a> +1 totally agree with this</div>
        </section>
        <footer>&copy; blog 2024 <a href="/rss">RSS</a></footer>
        </body>""",
        "Why pipelines fail at scale\n\n"
        "The first reason pipelines fail is that partition keys are chosen before the data is understood, and the hot keys only show up in production traffic.\n\n"
        "The second reason is shuffle amplification: every innocent groupBy doubles the bytes in flight until the cluster spends more time moving data than computing on it.",
    ),
    (
        "news article with inline ad and share bar",
        """<body>
        <nav class="menu"><a href="/world">World</a><a href="/tech">Tech</a><a href="/sport">Sport</a></nav>
        <main>
        <article>
        <p>City engineers announced on Tuesday that the harbour bridge will close for repairs over the coming weekend, affecting an estimated forty thousand commuters.</p>
        <div class="ad advert"><a href="/sponsor">Sponsored: buy gadgets now at half price today only</a></div>
        <p>Officials said the closure was scheduled to coincide with the holiday in order to minimise disruption, and that ferries would run extra services.</p>
        </article>
        <div class="share"><a href="/s/x">Share</a><a href="/s/fb">Post</a></div>
        </main>
        </body>""",
        "City engineers announced on Tuesday that the harbour bridge will close for repairs over the coming weekend, affecting an estimated forty thousand commuters.\n\n"
        "Officials said the closure was scheduled to coincide with the holiday in order to minimise disruption, and that ferries would run extra services.",
    ),
    (
        "docs page with TOC sidebar and code block",
        """<body>
        <aside class="sidebar"><ul>
          <li><a href="#install">Install</a></li><li><a href="#usage">Usage</a></li>
          <li><a href="#api">API</a></li><li><a href="#faq">FAQ</a></li>
        </ul></aside>
        <main class="content">
        <h2>Getting started with the engine</h2>
        <p>Install the package from the registry and create a session with the defaults; the engine configures adaptive execution and Arrow batching for you.</p>
        <pre>pip install engine && engine init --profile default</pre>
        <p>Every operator returns a DataFrame, so the whole pipeline composes with ordinary Spark code and the optimizer sees one plan.</p>
        </main>
        </body>""",
        "Getting started with the engine\n\n"
        "Install the package from the registry and create a session with the defaults; the engine configures adaptive execution and Arrow batching for you.\n\n"
        "pip install engine && engine init --profile default\n\n"
        "Every operator returns a DataFrame, so the whole pipeline composes with ordinary Spark code and the optimizer sees one plan.",
    ),
    (
        "newsletter interstitial splitting the article",
        """<body><article>
        <p>Long-haul measurements show the new routing layer cuts tail latency by a third across every region we tested, with the largest gains in the Pacific corridor.</p>
        <div class="newsletter subscribe"><h4>Never miss an update</h4><a href="/signup">Subscribe to our newsletter</a></div>
        <p>The rollout continues next quarter, when the remaining regions migrate off the legacy mesh and the old relays are finally decommissioned.</p>
        </article></body>""",
        "Long-haul measurements show the new routing layer cuts tail latency by a third across every region we tested, with the largest gains in the Pacific corridor.\n\n"
        "The rollout continues next quarter, when the remaining regions migrate off the legacy mesh and the old relays are finally decommissioned.",
    ),
    (
        "cookie wall before content",
        """<body>
        <div class="cookie-banner popup">We value your privacy. <a href="/cookies">Manage preferences</a> <button>Accept all</button></div>
        <main><article>
        <p>Researchers described a fermentation process that turns agricultural waste into a packaging foam which composts fully within sixty days.</p>
        </article></main>
        </body>""",
        "Researchers described a fermentation process that turns agricultural waste into a packaging foam which composts fully within sixty days.",
    ),
    (
        "listicle with li content (content list, not nav)",
        """<body><main class="content"><article>
        <h2>Three rules for reliable batch jobs</h2>
        <ul>
          <li>Make every task idempotent so a retry can never corrupt the output of a partial failure.</li>
          <li>Write manifests after the data commit, never before, so resume logic trusts only completed work.</li>
          <li>Bound every group so one pathological key cannot take down the task that processes it.</li>
        </ul>
        </article></main></body>""",
        "Three rules for reliable batch jobs\n\n"
        "Make every task idempotent so a retry can never corrupt the output of a partial failure.\n\n"
        "Write manifests after the data commit, never before, so resume logic trusts only completed work.\n\n"
        "Bound every group so one pathological key cannot take down the task that processes it.",
    ),
]


@pytest.mark.parametrize("name,html,expected", CASES, ids=[c[0] for c in CASES])
def test_realistic_extraction(name, html, expected):
    got, spans, n_blocks = extract_main_text(html.encode("utf-8"))
    assert got == expected, f"{name}:\nGOT: {got!r}\nEXP: {expected!r}"


WIKI_CASE = (
    "wikipedia-style article with infobox",
    """<body>
    <div class="infobox sidebar"><table><tr><th>Born</th><td>1867</td></tr>
    <tr><th>Field</th><td>Physics</td></tr></table></div>
    <main class="content"><article>
    <p>Marie Curie conducted pioneering research on radioactivity, a term she herself coined during her early investigations of uranium rays.</p>
    <blockquote>Nothing in life is to be feared, it is only to be understood.</blockquote>
    <p>She remains the only person to win Nobel Prizes in two different sciences, physics and chemistry, a distinction unmatched for over a century.</p>
    </article></main>
    </body>""",
    "Marie Curie conducted pioneering research on radioactivity, a term she herself coined during her early investigations of uranium rays.\n\n"
    "Nothing in life is to be feared, it is only to be understood.\n\n"
    "She remains the only person to win Nobel Prizes in two different sciences, physics and chemistry, a distinction unmatched for over a century.",
)

FORUM_CASE = (
    "forum thread: posts are content, signatures and vote bars are not",
    """<body>
    <div class="post"><p>Has anyone benchmarked the new adaptive shuffle against the static planner on wide joins with heavy skew in production workloads?</p>
    <div class="social vote-bar"><a href="/up">upvote</a> <a href="/down">downvote</a></div></div>
    <div class="post"><p>We ran it for a month; tail latencies dropped by roughly forty percent once the skew splitter kicked in on the hot keys.</p>
    <div class="share"><a href="/s">share</a></div></div>
    </body>""",
    "Has anyone benchmarked the new adaptive shuffle against the static planner on wide joins with heavy skew in production workloads?\n\n"
    "We ran it for a month; tail latencies dropped by roughly forty percent once the skew splitter kicked in on the hot keys.",
)

RECIPE_CASE = (
    "recipe page: ingredient list is content, rating widget is not",
    """<body>
    <div class="widget rating"><a href="/rate/5">rate this recipe five stars</a></div>
    <main><article class="post">
    <h2>Weeknight lentil soup</h2>
    <ul>
      <li>Two cups of red lentils rinsed well under running water until clear.</li>
      <li>One diced onion softened slowly in olive oil with a pinch of salt.</li>
    </ul>
    <p>Simmer everything together for twenty five minutes and finish with lemon juice before serving hot.</p>
    </article></main>
    </body>""",
    "Weeknight lentil soup\n\n"
    "Two cups of red lentils rinsed well under running water until clear.\n\n"
    "One diced onion softened slowly in olive oil with a pinch of salt.\n\n"
    "Simmer everything together for twenty five minutes and finish with lemon juice before serving hot.",
)


@pytest.mark.parametrize(
    "name,html,expected",
    [WIKI_CASE, FORUM_CASE, RECIPE_CASE],
    ids=[WIKI_CASE[0], FORUM_CASE[0], RECIPE_CASE[0]],
)
def test_more_realistic_layouts(name, html, expected):
    got, spans, n_blocks = extract_main_text(html.encode("utf-8"))
    assert got == expected, f"{name}:\nGOT: {got!r}\nEXP: {expected!r}"
