"""Wild-HTML fixture corpus: realistic messy page layouts with
HAND-SPECIFIED expected main text, byte-identical.

This is the extraction engine's honesty surface: unlike the synthetic
chrome model (which the extractor could in principle co-evolve with),
every fixture here is a hand-written page shape seen in real crawls —
comment sections, inline ads, cookie walls, TOCs, nested tables, entity
salad, HTML comments with decoy text, script/style decoys, misnested
tags, old-school table layouts — and the expected text is a human
judgment of what the main content IS, written down before running the
extractor. The reference's boilerplate-strip behavior is the
capability being mirrored (its fixtures are images; ours are DOM —
``/root/reference/test_img.py`` exercises real inputs the model never
trained on, this corpus is the DOM analog).

Consumed by ``tests/test_html_realistic.py`` (per-case pytest) and the
``extract_html_wild`` contract query (driver-facing: the oracle is the
expected text, verbatim, as a VALUES table — the extractor must
reproduce it byte-for-byte through the full distributed pipeline).

Each case: (fixture_id, name, html, expected_text). ``html`` is a str
(encoded utf-8 on the way in) or raw ``bytes`` for the charset-edge cases
— legacy encodings and BOMs are part of the scan contract
(``kernels/charset.py``) and belong on the honesty surface too.
"""

from __future__ import annotations

WILD_CASES: list[tuple[int, str, str | bytes, str]] = [
    (
        0,
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
        1,
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
        2,
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
        3,
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
        4,
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
        5,
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
    (
        6,
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
    ),
    (
        7,
        "forum thread: posts are content, signatures and vote bars are not",
        """<body>
        <div class="post"><p>Has anyone benchmarked the new adaptive shuffle against the static planner on wide joins with heavy skew in production workloads?</p>
        <div class="social vote-bar"><a href="/up">upvote</a> <a href="/down">downvote</a></div></div>
        <div class="post"><p>We ran it for a month; tail latencies dropped by roughly forty percent once the skew splitter kicked in on the hot keys.</p>
        <div class="share"><a href="/s">share</a></div></div>
        </body>""",
        "Has anyone benchmarked the new adaptive shuffle against the static planner on wide joins with heavy skew in production workloads?\n\n"
        "We ran it for a month; tail latencies dropped by roughly forty percent once the skew splitter kicked in on the hot keys.",
    ),
    (
        8,
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
    ),
    (
        9,
        "entity salad: named, decimal and hex entities decode in content",
        """<body><main><article>
        <p>Fish &amp; chips cost &pound;9 &#8212; that&#x27;s &quot;cheap&quot; for the seafront, &lt;according to locals&gt; who queue anyway.</p>
        <p>Caf&eacute; au lait &gt; instant coffee; the caf&#233; on the corner proves it every single morning without fail.</p>
        </article></main></body>""",
        "Fish & chips cost £9 — that's \"cheap\" for the seafront, <according to locals> who queue anyway.\n\n"
        "Café au lait > instant coffee; the café on the corner proves it every single morning without fail.",
    ),
    (
        10,
        "decoy text in comments, script, style and noscript is ignored",
        """<body>
        <!-- SIDEBAR: This commented-out paragraph used to be the old intro and must never appear in extraction output at all. -->
        <script>var tracking = "This string inside a script tag looks exactly like a sentence but is code.";</script>
        <style>.hero:before { content: "Decorative pseudo text that is styling, not content."; }</style>
        <noscript>Please enable JavaScript to view this site properly.</noscript>
        <main><article>
        <p>The observatory confirmed that the comet will be visible to the naked eye for eleven nights beginning late next week.</p>
        </article></main>
        </body>""",
        "The observatory confirmed that the comet will be visible to the naked eye for eleven nights beginning late next week.",
    ),
    (
        11,
        "old-school table layout: content lives in a td",
        """<body>
        <table width="100%"><tr>
        <td class="leftnav"><a href="/home">Home</a><br><a href="/about">About</a><br><a href="/links">Links</a></td>
        <td class="content">
        <p>The historical society voted to restore the mill wheel using oak beams cut from the same valley as the originals.</p>
        <p>Volunteers will document each step so that future repairs can follow the traditional joinery methods precisely.</p>
        </td>
        <td class="rightrail"><a href="/ad1">Visit our sponsor</a></td>
        </tr></table>
        </body>""",
        "The historical society voted to restore the mill wheel using oak beams cut from the same valley as the originals.\n\n"
        "Volunteers will document each step so that future repairs can follow the traditional joinery methods precisely.",
    ),
    (
        12,
        "data table inside the article is content",
        """<body><main><article>
        <p>The census compared the three harbour towns across a decade of ferry traffic and found steady growth in each.</p>
        <table class="data">
        <tr><td>Northport saw passenger numbers double after the new terminal opened to international routes.</td></tr>
        <tr><td>Southquay grew more slowly but kept the highest satisfaction scores in every yearly survey.</td></tr>
        </table>
        </article></main></body>""",
        "The census compared the three harbour towns across a decade of ferry traffic and found steady growth in each.\n\n"
        "Northport saw passenger numbers double after the new terminal opened to international routes.\n\n"
        "Southquay grew more slowly but kept the highest satisfaction scores in every yearly survey.",
    ),
    (
        13,
        "misnested and unclosed tags still yield the article",
        """<body>
        <div class="promo"><a href="/deal">Flash sale ends tonight</a></div>
        <main><article>
        <p>The engineers traced the outage to a <b>single <i>misconfigured</b> retry</i> policy that amplified traffic during the failover.
        <p>A staged rollback restored service in nine minutes, and the postmortem recommends jittered backoff as the default everywhere.
        </article></main>
        </body>""",
        "The engineers traced the outage to a single misconfigured retry policy that amplified traffic during the failover.\n\n"
        "A staged rollback restored service in nine minutes, and the postmortem recommends jittered backoff as the default everywhere.",
    ),
    (
        14,
        "figure with figcaption: caption is content, credit line is not",
        """<body><main><article>
        <p>Restorers uncovered a second painting beneath the portrait during routine infrared imaging of the gallery's oldest acquisition.</p>
        <figure>
        <img src="/img/xray.jpg" alt="">
        <figcaption>Infrared scan showing the hidden seascape beneath the portrait's varnish layers.</figcaption>
        </figure>
        <div class="credit meta"><a href="/photog">Photo: gallery archive</a></div>
        </article></main></body>""",
        "Restorers uncovered a second painting beneath the portrait during routine infrared imaging of the gallery's oldest acquisition.\n\n"
        "Infrared scan showing the hidden seascape beneath the portrait's varnish layers.",
    ),
    (
        15,
        "div soup: deeply nested wrappers around one real article",
        """<body>
        <div id="root"><div class="app"><div class="page-wrap"><div class="grid">
        <div class="row"><div class="col header-zone"><a href="/">SiteName</a> <a href="/login">Log in</a></div></div>
        <div class="row"><div class="col main-zone"><div class="card"><div class="card-body">
        <p>Wind farms off the northern coast generated a record share of the grid's power during the autumn storm season.</p>
        <p>Analysts credit the new turbine blades, which keep generating in gusts that previously forced shutdowns.</p>
        </div></div></div></div>
        <div class="row"><div class="col footer-zone"><a href="/terms">Terms</a> <a href="/privacy">Privacy</a></div></div>
        </div></div></div></div>
        </body>""",
        "Wind farms off the northern coast generated a record share of the grid's power during the autumn storm season.\n\n"
        "Analysts credit the new turbine blades, which keep generating in gusts that previously forced shutdowns.",
    ),
    (
        16,
        "pre block with html-looking code is preserved verbatim",
        """<body><main class="content">
        <h2>Escaping markup in templates</h2>
        <p>Template engines must escape user input before interpolation, otherwise stored markup executes when the page renders.</p>
        <pre>&lt;div class="user"&gt;{{ name }}&lt;/div&gt;</pre>
        </main></body>""",
        "Escaping markup in templates\n\n"
        "Template engines must escape user input before interpolation, otherwise stored markup executes when the page renders.\n\n"
        '<div class="user">{{ name }}</div>',
    ),
    (
        17,
        "repeated boilerplate paragraph does not outrank the article",
        """<body>
        <div class="banner top"><a href="/subscribe">Subscribe today and save forty percent on an annual digital pass</a></div>
        <main><article>
        <p>Marine biologists tagged forty juvenile turtles this season and recorded the earliest northward migration in the study's history.</p>
        <p>Warmer currents appear to be shifting the feeding grounds, and the team will expand satellite coverage next year.</p>
        </article></main>
        <div class="banner bottom"><a href="/subscribe">Subscribe today and save forty percent on an annual digital pass</a></div>
        </body>""",
        "Marine biologists tagged forty juvenile turtles this season and recorded the earliest northward migration in the study's history.\n\n"
        "Warmer currents appear to be shifting the feeding grounds, and the team will expand satellite coverage next year.",
    ),
    (
        18,
        "windows-1252 page declared via meta charset",
        (
            '<html><head><meta charset="windows-1252"></head><body><main><article>'
            "<p>The caf\xe9 critic wrote “an almost perfect cro\xfbte” about the bakery – praise the owners framed.</p>"
            "</article></main></body></html>"
        ).encode("windows-1252"),
        "The café critic wrote “an almost perfect croûte” about the bakery – praise the owners framed.",
    ),
    (
        19,
        "utf-8 BOM page: BOM never leaks into extracted text",
        b"\xef\xbb\xbf"
        + (
            "<body><main><article>"
            "<p>Editors adopted the new style guide unanimously after a short debate about serial commas and em dashes.</p>"
            "</article></main></body>"
        ).encode("utf-8"),
        "Editors adopted the new style guide unanimously after a short debate about serial commas and em dashes.",
    ),
    (
        20,
        "http-equiv content-type with latin-1 label (WHATWG-mapped to cp1252)",
        (
            '<html><head><meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1"></head>'
            "<body><div class=\"nav\"><a href=\"/fr\">Fran\xe7ais</a><a href=\"/de\">Deutsch</a></div><main><article>"
            "<p>La r\xe9union annuelle des \xe9diteurs aura lieu \xe0 Gen\xe8ve cette ann\xe9e, comme pr\xe9vu depuis longtemps.</p>"
            "</article></main></body></html>"
        ).encode("windows-1252"),
        "La réunion annuelle des éditeurs aura lieu à Genève cette année, comme prévu depuis longtemps.",
    ),
    (
        21,
        "SPA shell: script-state text and noscript plea never leak",
        '<body><div id="root"></div><script>window.__DATA__={"title":"Fake article text inside a script blob that must not leak"};</script><noscript>You need JavaScript to run this app.</noscript></body>',
        "",
    ),
    (
        22,
        "right-to-left Arabic article extracts verbatim",
        "<body><main><article><p>أعلنت المكتبة الوطنية عن مشروع لرقمنة المخطوطات النادرة خلال العامين المقبلين بالتعاون مع جامعات عدة.</p></article></main></body>",
        "أعلنت المكتبة الوطنية عن مشروع لرقمنة المخطوطات النادرة خلال العامين المقبلين بالتعاون مع جامعات عدة.",
    ),
    (
        23,
        "non-breaking spaces normalize to plain spaces",
        "<body><main><article><p>Prices&nbsp;rose&nbsp;again this quarter, according to the latest figures published by the statistics office.</p></article></main></body>",
        "Prices rose again this quarter, according to the latest figures published by the statistics office.",
    ),
    (
        24,
        "ordered list of instructions is content",
        "<body><main><article><h2>Setup steps</h2><ol><li>Download the installer from the releases page and verify its checksum carefully.</li><li>Run the installer with default options unless policy requires a custom prefix.</li></ol></article></main></body>",
        "Setup steps\n\nDownload the installer from the releases page and verify its checksum carefully.\n\nRun the installer with default options unless policy requires a custom prefix.",
    ),
    (
        25,
        "blockquote-heavy opinion piece keeps every quote",
        "<body><main><article><p>Critics responded quickly to the announcement with unusually strong language.</p><blockquote>This is the most significant change to the format in twenty years, full stop.</blockquote><blockquote>A cautious welcome is the best we can offer until the details are published.</blockquote></article></main></body>",
        "Critics responded quickly to the announcement with unusually strong language.\n\nThis is the most significant change to the format in twenty years, full stop.\n\nA cautious welcome is the best we can offer until the details are published.",
    ),
    (
        26,
        "headline-only breaking-news page",
        "<body><main><article><h1>Volcano erupts off the southern coast forcing overnight evacuations</h1></article></main></body>",
        "Volcano erupts off the southern coast forcing overnight evacuations",
    ),
    (
        27,
        "nested related-article teaser is chrome, outer article is content",
        '<body><main><article><p>The report summarizes the committee findings on rural broadband coverage and its funding gaps.</p><article class="related"><a href="/r1">Related: broadband map updated</a></article></article></main></body>',
        "The report summarizes the committee findings on rural broadband coverage and its funding gaps.",
    ),
    (
        28,
        "search-results page of bare links is not main content",
        '<body><div class="results"><div class="result"><a href="/r/1">First result title goes here</a></div><div class="result"><a href="/r/2">Second result title goes here</a></div><div class="result"><a href="/r/3">Third result title goes here</a></div></div><div class="pagination"><a href="/p/2">Next</a></div></body>',
        "",
    ),
    (
        29,
        "breadcrumb trail is chrome",
        '<body><nav class="breadcrumb"><a href="/">Home</a> &gt; <a href="/news">News</a> &gt; <a href="/news/science">Science</a></nav><main><article><p>Astronomers catalogued three hundred new variable stars in the survey\'s first data release this week.</p></article></main></body>',
        "Astronomers catalogued three hundred new variable stars in the survey's first data release this week.",
    ),
    (
        30,
        "email-newsletter table layout: body kept, unsubscribe footer stripped",
        '<body><table role="presentation"><tr><td><p>Welcome to the weekly digest; this issue covers storage formats, query planners and a field report from the data platform migration.</p></td></tr><tr><td class="footer"><a href="/unsub">Unsubscribe</a> <a href="/prefs">Preferences</a></td></tr></table></body>',
        "Welcome to the weekly digest; this issue covers storage formats, query planners and a field report from the data platform migration.",
    ),
    (
        31,
        "print header/footer chrome stripped",
        '<body><div class="print-header">Printed from example.com on 2024-01-01</div><main><article><p>The council approved the riverside path extension after two years of public consultation and budget review.</p></article></main><div class="print-footer"><a href="/terms">Terms</a> Page 1 of 1</div></body>',
        "The council approved the riverside path extension after two years of public consultation and budget review.",
    ),
    (
        32,
        "AMP page: custom amp-* elements, sponsored amp-ad stripped",
        """<body>
        <header class="masthead"><a href="/">AMP News</a></header>
        <article>
        <p>The transit authority published ridership figures showing weekday boardings back at ninety percent of their level before the disruption.</p>
        <amp-ad class="sponsored-slot" width="300" height="250"><a href="/sp">Sponsored: compare travel cards and save on every trip</a></amp-ad>
        <p>Analysts attributed the recovery to schedule changes on the two busiest lines and to the new off-peak fare cap.</p>
        </article>
        <amp-sidebar class="sidebar"><a href="/world">World</a><a href="/city">City</a></amp-sidebar>
        </body>""",
        "The transit authority published ridership figures showing weekday boardings back at ninety percent of their level before the disruption.\n\n"
        "Analysts attributed the recovery to schedule changes on the two busiest lines and to the new off-peak fare cap.",
    ),
    (
        33,
        "infinite-scroll stub: loader and skeleton placeholders stripped",
        """<body><main class="content">
        <article>
        <p>Volunteers mapped four hundred kilometres of footpaths this spring, closing the last gaps in the regional trail network after a decade of surveys.</p>
        </article>
        <div class="loading-spinner">Loading more stories…</div>
        <div class="skeleton-card loading"></div>
        <div class="skeleton-card loading"></div>
        </main></body>""",
        "Volunteers mapped four hundred kilometres of footpaths this spring, closing the last gaps in the regional trail network after a decade of surveys.",
    ),
    (
        34,
        "paywall interstitial: lede kept, gate stripped",
        """<body><article>
        <p>The auditor's report found the tunnel project eight months behind schedule and identified the ventilation contract as the main source of the delay.</p>
        <div class="paywall-gate"><h4>Keep reading</h4> Already a subscriber? <a href="/login">Sign in</a> <a href="/offer">Subscribe from $1 a week</a></div>
        </article></body>""",
        "The auditor's report found the tunnel project eight months behind schedule and identified the ventilation contract as the main source of the delay.",
    ),
    (
        35,
        "noscript image fallback never leaks",
        """<body><main><article>
        <p>Conservators reopened the painted hall after a three-year cleaning campaign that removed a century of varnish from the ceiling.</p>
        <noscript><img src="/static/hall.jpg"><p>Your browser does not support scripts; view the gallery archive instead.</p></noscript>
        <p>Visitor numbers in the first month exceeded the annual total of the years before the closure.</p>
        </article></main></body>""",
        "Conservators reopened the painted hall after a three-year cleaning campaign that removed a century of varnish from the ceiling.\n\n"
        "Visitor numbers in the first month exceeded the annual total of the years before the closure.",
    ),
    (
        36,
        "MSO conditional comments in an email newsletter ignored",
        """<body>
        <!--[if mso]><table><tr><td>Outlook-only padding cell with decoy words<![endif]-->
        <table role="presentation"><tr><td>
        <p>This month the platform team retired the last of the legacy ingestion jobs and moved the final feeds onto the streaming path.</p>
        </td></tr><tr><td class="footer"><a href="/unsubscribe">Unsubscribe</a> <a href="/view">View in browser</a></td></tr></table>
        <!--[if mso]></td></tr></table><![endif]-->
        </body>""",
        "This month the platform team retired the last of the legacy ingestion jobs and moved the final feeds onto the streaming path.",
    ),
    (
        37,
        "GDPR consent modal with partner blurb stripped",
        """<body>
        <div class="consent-modal popup">We and our 847 partners store and access information on your device to provide personalised content. <button>Accept all</button> <button>Reject all</button> <a href="/partners">See partners</a></div>
        <main><article>
        <p>A survey of two thousand farms found cover cropping doubled soil carbon on the plots that kept the practice for five consecutive seasons.</p>
        </article></main></body>""",
        "A survey of two thousand farms found cover cropping doubled soil carbon on the plots that kept the practice for five consecutive seasons.",
    ),
    (
        38,
        "JSON-LD and OpenGraph decoys ignored",
        """<head><meta property="og:description" content="Meta decoy text that must not leak."><title>Title decoy</title></head><body>
        <script type="application/ld+json">{"@type":"NewsArticle","headline":"Structured-data decoy headline that looks like a sentence.","articleBody":"Decoy body text inside JSON-LD."}</script>
        <article>
        <p>Engineers traced the outage to a certificate that expired in a region the dashboard had stopped monitoring after an unrelated migration.</p>
        </article></body>""",
        "Engineers traced the outage to a certificate that expired in a region the dashboard had stopped monitoring after an unrelated migration.",
    ),
    (
        39,
        "related-articles grid after the story stripped",
        """<body><main>
        <article>
        <p>The observatory's new spectrograph resolved the binary pair at the heart of the cluster, settling a forty-year argument about its mass.</p>
        </article>
        <div class="related-posts"><h4>More like this</h4>
        <ul><li><a href="/a/1">How spectrographs work</a></li><li><a href="/a/2">The cluster catalogue</a></li><li><a href="/a/3">Observing guide</a></li></ul>
        </div>
        </main></body>""",
        "The observatory's new spectrograph resolved the binary pair at the heart of the cluster, settling a forty-year argument about its mass.",
    ),
    (
        40,
        "product page: description kept, menu and reviews stripped",
        """<body>
        <ul class="menu"><li><a href="/">Shop</a></li><li><a href="/cart">Cart</a></li><li><a href="/account">Account</a></li></ul>
        <main class="content">
        <h1>Field kettle, 1.2 litre</h1>
        <div class="description"><p>Spun from a single sheet of stainless steel, the kettle boils a litre in under four minutes on any stove and packs flat inside its own cup.</p></div>
        <section class="reviews comment-list"><div class="comment"><a href="/u/9">hiker_9</a> boils fast, lid rattles a bit</div></section>
        </main></body>""",
        "Field kettle, 1.2 litre\n\n"
        "Spun from a single sheet of stainless steel, the kettle boils a litre in under four minutes on any stove and packs flat inside its own cup.",
    ),
    (
        41,
        "sticky app-install banner and floating chat bubble stripped",
        """<body>
        <div class="app-banner sticky">Get our app for the best experience <a href="/install">Install</a> <button>Not now</button></div>
        <article>
        <p>The harbour master confirmed that the channel will be dredged to nine metres, allowing the larger ferries to berth at all tide states.</p>
        </article>
        <div class="chat-widget floating"><button>Chat with us</button></div>
        </body>""",
        "The harbour master confirmed that the channel will be dredged to nine metres, allowing the larger ferries to berth at all tide states.",
    ),
    (
        42,
        "live-blog: timestamped updates are content, refresh chrome is not",
        """<body>
        <div class="banner live">LIVE <button>Auto-refresh</button></div>
        <main><article>
        <h1>Storm response: rolling updates</h1>
        <p>14:02 Crews have restored power to the eastern grid and are moving to the coastal substations next, the utility said.</p>
        <p>13:41 The harbour road reopened to buses after engineers cleared the fallen crane from the intersection.</p>
        <p>13:15 Emergency services asked residents to stay off the waterfront promenade until the surge barrier is inspected.</p>
        </article></main>
        <div class="widget updates-loading">Checking for new updates…</div>
        </body>""",
        "Storm response: rolling updates\n\n"
        "14:02 Crews have restored power to the eastern grid and are moving to the coastal substations next, the utility said.\n\n"
        "13:41 The harbour road reopened to buses after engineers cleared the fallen crane from the intersection.\n\n"
        "13:15 Emergency services asked residents to stay off the waterfront promenade until the surge barrier is inspected.",
    ),
    (
        43,
        "FAQ accordion: summary questions and answers are both content",
        """<body>
        <nav class="menu"><a href="/">Home</a><a href="/pricing">Pricing</a><a href="/faq">FAQ</a></nav>
        <main class="content">
        <h2>Frequently asked questions</h2>
        <details><summary>How is usage metered?</summary>
        <p>Usage is metered per processed document, rounded up to the nearest thousand, and idle sessions are never billed.</p></details>
        <details><summary>Can I export my data?</summary>
        <p>Exports are available at any time as partitioned parquet files, and we keep them downloadable for thirty days.</p></details>
        </main>
        <footer><a href="/terms">Terms</a><a href="/privacy">Privacy</a></footer>
        </body>""",
        "Frequently asked questions\n\n"
        "How is usage metered?\n\n"
        "Usage is metered per processed document, rounded up to the nearest thousand, and idle sessions are never billed.\n\n"
        "Can I export my data?\n\n"
        "Exports are available at any time as partitioned parquet files, and we keep them downloadable for thirty days.",
    ),
    (
        44,
        "dictionary entry: definition list is content, pronunciation widget is not",
        """<body>
        <header class="masthead"><a href="/">Wordbook</a></header>
        <main><article>
        <h1>petrichor</h1>
        <div class="widget pronounce"><button>Play</button> /ˈpɛtrɪkɔːr/</div>
        <dl>
        <dt>noun</dt>
        <dd>The pleasant, earthy smell that accompanies the first rain after a long period of warm, dry weather.</dd>
        <dt>origin</dt>
        <dd>Coined in the 1960s from the Greek petra, meaning stone, and ichor, the fluid said to flow in the veins of the gods.</dd>
        </dl>
        </article></main>
        <aside class="related"><a href="/word/geosmin">geosmin</a><a href="/word/loam">loam</a></aside>
        </body>""",
        "petrichor\n\n"
        "noun\n\n"
        "The pleasant, earthy smell that accompanies the first rain after a long period of warm, dry weather.\n\n"
        "origin\n\n"
        "Coined in the 1960s from the Greek petra, meaning stone, and ichor, the fluid said to flow in the veins of the gods.",
    ),
    (
        45,
        "video page: transcript is content, player chrome is not",
        """<body>
        <div class="player widget">
          <button>Play</button><button>Mute</button><span>04:12 / 18:30</span>
          <div class="loading spinner">Buffering…</div>
        </div>
        <main><article>
        <h2>Interview transcript: building the new observatory</h2>
        <p>We started with the mirror because everything else in the budget flows from its diameter, and a metre more glass doubles the dome.</p>
        <p>The site was chosen for its two hundred clear nights a year, which matters more than altitude once you pass two thousand metres.</p>
        </article></main>
        <div class="related-videos related"><a href="/v/2">Next: polishing the mirror</a></div>
        </body>""",
        "Interview transcript: building the new observatory\n\n"
        "We started with the mirror because everything else in the budget flows from its diameter, and a metre more glass doubles the dome.\n\n"
        "The site was chosen for its two hundred clear nights a year, which matters more than altitude once you pass two thousand metres.",
    ),
    (
        46,
        "paginated article: page body is content, pagination rail is not",
        """<body>
        <main><article>
        <p>By the second winter the expedition had learned to read the ice, and the diary entries turn from fear to a kind of professional calm.</p>
        <p>Supplies cached the previous autumn were found intact, which the captain credits for the party's unbroken health through the darkest months.</p>
        </article></main>
        <nav class="pagination"><a href="/story?page=1">Previous</a><span>Page 2 of 3</span><a href="/story?page=3">Next</a></nav>
        <footer>&copy; 2025 The Archive <a href="/about">About</a></footer>
        </body>""",
        "By the second winter the expedition had learned to read the ice, and the diary entries turn from fear to a kind of professional calm.\n\n"
        "Supplies cached the previous autumn were found intact, which the captain credits for the party's unbroken health through the darkest months.",
    ),
    (
        47,
        "press release: body kept, media-contact and about boilerplate stripped",
        """<body>
        <main><article>
        <h1>Meridian Labs opens its fourth fabrication line</h1>
        <p>The new line doubles wafer capacity and is the first to run entirely on the plant's own solar and storage microgrid.</p>
        <p>Production begins in June, with the first customer shipments scheduled before the end of the quarter.</p>
        </article></main>
        <aside class="about boilerplate"><h4>About Meridian Labs</h4><p>Meridian Labs is a leading provider of photonic components with offices worldwide.</p></aside>
        <footer class="contact">Media contact: press@example.com, +1 555 0100</footer>
        </body>""",
        "Meridian Labs opens its fourth fabrication line\n\n"
        "The new line doubles wafer capacity and is the first to run entirely on the plant's own solar and storage microgrid.\n\n"
        "Production begins in June, with the first customer shipments scheduled before the end of the quarter.",
    ),
    (
        48,
        "soft-404: apology text is the page's content, search chrome is not",
        """<body>
        <header class="site-header"><a href="/">News Home</a></header>
        <main class="content">
        <h1>We can't find that page</h1>
        <p>The article you followed may have been moved to our new archive, or the link you used may be out of date.</p>
        <p>Try searching for the headline, or browse today's front page for the latest coverage.</p>
        <form action="/search"><input name="q"><button>Search</button></form>
        </main>
        <footer><a href="/sitemap">Sitemap</a></footer>
        </body>""",
        "We can't find that page\n\n"
        "The article you followed may have been moved to our new archive, or the link you used may be out of date.\n\n"
        "Try searching for the headline, or browse today's front page for the latest coverage.",
    ),
    (
        49,
        "academic abstract: abstract and keywords kept, citation widget stripped",
        """<body>
        <main><article>
        <h1>Streaming deduplication of web corpora at trillion-document scale</h1>
        <p>Abstract. We present a banded signature scheme whose recall is guaranteed by a pigeonhole argument rather than tuned empirically, and show that candidate verification dominates total cost only below one duplicate per thousand documents.</p>
        <p>Keywords: deduplication, minhash, web corpora, distributed systems.</p>
        </article></main>
        <div class="widget cite-export"><button>BibTeX</button><button>RIS</button><button>EndNote</button></div>
        <aside class="related"><h4>Related articles</h4><a href="/p/77">Sharded suffix arrays</a></aside>
        </body>""",
        "Streaming deduplication of web corpora at trillion-document scale\n\n"
        "Abstract. We present a banded signature scheme whose recall is guaranteed by a pigeonhole argument rather than tuned empirically, and show that candidate verification dominates total cost only below one duplicate per thousand documents.\n\n"
        "Keywords: deduplication, minhash, web corpora, distributed systems.",
    ),
    (
        50,
        "HTML5 article header holds the headline, article footer holds tag chrome",
        """<body>
        <main><article>
        <header><h1>Glacier survey finds record summer melt</h1></header>
        <p>Field teams measured a four-metre loss of surface ice on the central plateau, the largest single-season drop in the forty-year record.</p>
        <p>The survey attributes two thirds of the loss to the heat dome in July and the rest to reduced winter snowfall.</p>
        <footer>Filed under: <a href="/t/climate">Climate</a> <a href="/t/science">Science</a></footer>
        </article></main>
        </body>""",
        "Glacier survey finds record summer melt\n\n"
        "Field teams measured a four-metre loss of surface ice on the central plateau, the largest single-season drop in the forty-year record.\n\n"
        "The survey attributes two thirds of the loss to the heat dome in July and the rest to reduced winter snowfall.",
    ),
    (
        51,
        "page masthead header stripped, article-scoped header kept, same document",
        """<body>
        <header class="masthead"><a href="/">The Daily Ledger</a> Independent reporting since 1994</header>
        <main><article>
        <header><h2>Council approves the riverfront housing plan</h2></header>
        <p>The vote passed seven to two after a four-hour session, clearing the way for twelve hundred homes on the former rail yard.</p>
        </article></main>
        <footer>Contact the newsroom at tips@example.org or call the desk after nine.</footer>
        </body>""",
        "Council approves the riverfront housing plan\n\n"
        "The vote passed seven to two after a four-hour session, clearing the way for twelve hundred homes on the former rail yard.",
    ),
    (
        52,
        "inline form-control labels (read-more, copy buttons) never leak",
        """<body><main><article>
        <p>The scheduler assigns each partition to the executor holding its cached block, falling back to any free slot after the locality wait expires. <button class="expand">Read more</button></p>
        <pre>spark.conf.set("spark.locality.wait", "0s") <button>Copy</button></pre>
        <p>Set the wait to zero only when the cluster's network is faster than its disks; otherwise locality is still worth the idle slot. <select><option>Show comments</option><option>Hide comments</option></select></p>
        </article></main></body>""",
        "The scheduler assigns each partition to the executor holding its cached block, falling back to any free slot after the locality wait expires.\n\n"
        'spark.conf.set("spark.locality.wait", "0s")\n\n'
        "Set the wait to zero only when the cluster's network is faster than its disks; otherwise locality is still worth the idle slot.",
    ),
    (
        53,
        "byline and dateline metadata stripped; third-party comment embed stripped",
        """<body><main><article>
        <h1>Reservoir levels recover after wet spring</h1>
        <p class="byline">By Jane Doe, Environment Desk <time>April 2, 2025</time></p>
        <p>Storage across the basin stands at ninety-one percent of capacity, the highest level for this date in eleven years.</p>
        <p>Operators cautioned that one wet season does not end the drought rules, which remain tied to the three-year rolling average.</p>
        </article></main>
        <div id="disqus_thread"><p>Loading comments from a third-party embed requires consent. Enable the embed to join the discussion.</p></div>
        </body>""",
        "Reservoir levels recover after wet spring\n\n"
        "Storage across the basin stands at ninety-one percent of capacity, the highest level for this date in eleven years.\n\n"
        "Operators cautioned that one wet season does not end the drought rules, which remain tied to the three-year rolling average.",
    ),
    (
        54,
        "hidden-at-parse nodes never extracted: display:none, [hidden], aria-hidden",
        """<body><main><article>
        <h1>Ferry timetable changes take effect Monday</h1>
        <p>The morning crossings move fifteen minutes earlier to clear the dredging window, and the late boat is extended to midnight on Fridays.</p>
        <div style="display: none"><p>Legacy timetable kept in the page for a script to diff against; riders should never read this sentence.</p></div>
        <p hidden>Editor draft: confirm the midnight extension with the harbour office before publishing.</p>
        <div aria-hidden="true"><p>Decorative duplicate slide of the announcement used by the carousel animation.</p></div>
        </article></main>
        </body>""",
        "Ferry timetable changes take effect Monday\n\n"
        "The morning crossings move fifteen minutes earlier to clear the dredging window, and the late boat is extended to midnight on Fridays.",
    ),
    (
        55,
        "ARIA landmarks on divs: banner/navigation/contentinfo stripped, role=main kept",
        """<body>
        <div role="banner"><a href="/">Old Bootstrap Site</a> The finest gadget reviews on the early web</div>
        <div role="navigation"><a href="/reviews">Reviews</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>
        <div role="main">
        <h2>Review: the pocket barometer</h2>
        <p>The barometer reads true within one hectopascal across the whole tested range, and the bezel clicks with a confidence modern instruments have lost.</p>
        </div>
        <div role="contentinfo">Copyright two thousand twenty five, all rights reserved to the example publisher.</div>
        </body>""",
        "Review: the pocket barometer\n\n"
        "The barometer reads true within one hectopascal across the whole tested range, and the bezel clicks with a confidence modern instruments have lost.",
    ),
    (
        56,
        "media fallback text and dialog modals never extracted",
        """<body><main><article>
        <h1>Concert review: the visiting quartet</h1>
        <p>The quartet opened with a reading of the slow movement that favoured clarity over sentiment, and the hall rewarded them with a long silence before the applause.</p>
        <video controls src="clip.mp4">Your browser does not support the video tag. Download the performance clip from the archive page instead.</video>
        <canvas id="seating-viz">Fallback text: your browser cannot render the interactive seating chart canvas element.</canvas>
        <audio src="encore.mp3">Audio playback is not supported on this device; a transcript is available below.</audio>
        <dialog><p>Before you go: subscribe to our weekly reviews, delivered to your inbox every Friday morning.</p></dialog>
        <dialog open><p>We value your privacy. Accept all cookies to continue reading this performance review.</p></dialog>
        <p>After the interval the programme turned to the new commission, whose off-beat rhythms the players handled with visible pleasure.</p>
        </article></main></body>""",
        "Concert review: the visiting quartet\n\n"
        "The quartet opened with a reading of the slow movement that favoured clarity over sentiment, and the hall rewarded them with a long silence before the applause.\n\n"
        "After the interval the programme turned to the new commission, whose off-beat rhythms the players handled with visible pleasure.",
    ),
    (
        57,
        "ruby annotations: rt reading glosses and rp parentheses never double the base text",
        """<body><main><article>
        <h1>駅の案内表示が新しくなりました</h1>
        <p>中央口の看板には<ruby>東京<rp>（</rp><rt>とうきょう</rt><rp>）</rp></ruby>駅と<ruby>乗換<rp>（</rp><rt>のりかえ</rt><rp>）</rp></ruby>通路の方向が示されています。</p>
        <p>通路を進むと五分ほどで在来線の改札に着きます。</p>
        </article></main></body>""",
        "駅の案内表示が新しくなりました\n\n"
        "中央口の看板には東京駅と乗換通路の方向が示されています。\n\n"
        "通路を進むと五分ほどで在来線の改札に着きます。",
    ),
    (
        58,
        "invisible layout characters stripped: soft hyphens, zero-width spaces, stray BOM",
        """<body><main><article>
        <h1>Donau&shy;dampf&shy;schifffahrts company wins river contract</h1>
        <p>The shipping group announced a frame&shy;work agreement covering river logistics, with zero&#8203;width breaks the CMS inserts between compound words and a stray ﻿byte-order mark mid-sentence.</p>
        <p>Family emoji stay joined: 👨‍👩‍👧 appears exactly as published, because zero-width joiners are meaning, not layout.</p>
        </article></main></body>""",
        "Donaudampfschifffahrts company wins river contract\n\n"
        "The shipping group announced a framework agreement covering river logistics, with zerowidth breaks the CMS inserts between compound words and a stray byte-order mark mid-sentence.\n\n"
        "Family emoji stay joined: 👨‍👩‍👧 appears exactly as published, because zero-width joiners are meaning, not layout.",
    ),
    (
        59,
        "br line breaks separate words; wbr renders nothing",
        """<body><main><article>
        <h1>Poem of the day: harbour dusk</h1>
        <p>The harbour lights go dim at dusk<br>and every mast a shadow casts<br/>upon the quiet water.</p>
        <p>Subscribers can read the accompanying essay on Rotterdamseplein&shy;straat's ship<wbr>building quarter in the weekend edition.</p>
        </article></main></body>""",
        "Poem of the day: harbour dusk\n\n"
        "The harbour lights go dim at dusk and every mast a shadow casts upon the quiet water.\n\n"
        "Subscribers can read the accompanying essay on Rotterdamsepleinstraat's shipbuilding quarter in the weekend edition.",
    ),
    (
        60,
        "MathML annotation source never doubles the rendered formula",
        """<body><main><article>
        <h1>The quadratic formula explained</h1>
        <p>The discriminant decides everything: <math><semantics><mrow><msup><mi>b</mi><mn>2</mn></msup><mo>-</mo><mn>4</mn><mi>a</mi><mi>c</mi></mrow><annotation encoding="application/x-tex">b^{2}-4ac</annotation></semantics></math> must be nonnegative for the roots to be real.</p>
        <p>When it is exactly zero the parabola touches the axis once, a case teachers love for its tidiness.</p>
        </article></main></body>""",
        "The quadratic formula explained\n\n"
        "The discriminant decides everything: b2-4ac must be nonnegative for the roots to be real.\n\n"
        "When it is exactly zero the parabola touches the axis once, a case teachers love for its tidiness.",
    ),
    (
        61,
        "progress/meter widget fallback text never extracted",
        """<body><main><article>
        <h1>Fundraiser passes the halfway mark</h1>
        <p>The restoration appeal reached fifty-eight percent of its goal this week, driven by a surge of small donations after the open day.</p>
        <p>Campaign progress: <progress max="100" value="58">58 percent complete so far</progress> <meter min="0" max="10" value="7">7 out of 10 donor rating</meter> according to the live tracker.</p>
        </article></main></body>""",
        "Fundraiser passes the halfway mark\n\n"
        "The restoration appeal reached fifty-eight percent of its goal this week, driven by a surge of small donations after the open day.\n\n"
        "Campaign progress: according to the live tracker.",
    ),
    (
        62,
        "terse numeric data table drops as cell soup; surrounding prose kept (complement of case 12)",
        """<body><main><article>
        <h1>Quarterly results by region</h1>
        <p>The company reported stronger volumes across all regions, with the detail broken out in the table below for reference.</p>
        <table><caption>Revenue by region, in millions</caption>
        <tr><th>Region</th><th>Revenue</th></tr>
        <tr><td>North</td><td>120</td></tr>
        <tr><td>South</td><td>95</td></tr></table>
        <p>The northern region led for a third consecutive quarter on stronger port volumes and a new international service.</p>
        </article></main></body>""",
        "Quarterly results by region\n\n"
        "The company reported stronger volumes across all regions, with the detail broken out in the table below for reference.\n\n"
        "The northern region led for a third consecutive quarter on stronger port volumes and a new international service.",
    ),
    (
        63,
        "syntax-highlighted code: token span soup reassembles verbatim",
        """<body><main><article>
        <h1>Reading a parquet footer by hand</h1>
        <p>The magic bytes sit at both ends of the file, so a reader can verify the format before parsing any metadata at all.</p>
        <pre><code><span class="kw">def</span> <span class="fn">read_footer</span><span class="p">(</span><span class="v">path</span><span class="p">):</span>
    <span class="kw">with</span> <span class="fn">open</span><span class="p">(</span><span class="v">path</span><span class="p">,</span> <span class="s">"rb"</span><span class="p">)</span> <span class="kw">as</span> <span class="v">f</span><span class="p">:</span>
        <span class="kw">return</span> <span class="v">f</span><span class="p">.</span><span class="fn">read</span><span class="p">()[</span><span class="n">-8</span><span class="p">:]</span></code></pre>
        <p>Highlighters wrap every token in its own span, and the whitespace between tokens lives in the text nodes, never in the markup.</p>
        </article></main></body>""",
        "Reading a parquet footer by hand\n\n"
        "The magic bytes sit at both ends of the file, so a reader can verify the format before parsing any metadata at all.\n\n"
        '''def read_footer(path):
    with open(path, "rb") as f:
        return f.read()[-8:]'''
        "\n\n"
        "Highlighters wrap every token in its own span, and the whitespace between tokens lives in the text nodes, never in the markup.",
    ),
    (
        64,
        "article split across several section elements stays in order",
        """<body><main><article>
        <h1>The long road to the new terminal</h1>
        <section><h2>Planning</h2>
        <p>Planning permission alone took six years, with three public inquiries and a judicial review before the first drawing was approved.</p></section>
        <section><h2>Construction</h2>
        <p>Construction went faster than anyone predicted because the contractor prefabricated the concourse roof in sections upriver.</p></section>
        <section><h2>Opening day</h2>
        <p>On opening day the first arrival was a delayed night ferry, which staff considered a fitting start.</p></section>
        </article></main></body>""",
        "The long road to the new terminal\n\n"
        "Planning\n\n"
        "Planning permission alone took six years, with three public inquiries and a judicial review before the first drawing was approved.\n\n"
        "Construction\n\n"
        "Construction went faster than anyone predicted because the contractor prefabricated the concourse roof in sections upriver.\n\n"
        "Opening day\n\n"
        "On opening day the first arrival was a delayed night ferry, which staff considered a fitting start.",
    ),
    (
        65,
        "aside pull-quote and inline read-more box stripped mid-article",
        """<body><main><article>
        <h1>Ferry operator doubles winter timetable</h1>
        <p>The operator said demand had grown so quickly that winter sailings would now match the summer schedule for the first time in its history.</p>
        <aside class="pullquote">\u201cDemand has never been like this\u201d</aside>
        <p>Commuter groups welcomed the change but warned that the older vessels would need refits to handle the rougher season.</p>
        <div class="read-more-box"><strong>READ MORE:</strong> <a href="/a1">Harbour dredging resumes</a> <a href="/a2">New icebreaker ordered</a></div>
        <p>A spokesperson confirmed the refit budget had already been approved by the board.</p>
        </article></main></body>""",
        "Ferry operator doubles winter timetable\n\n"
        "The operator said demand had grown so quickly that winter sailings would now match the summer schedule for the first time in its history.\n\n"
        "Commuter groups welcomed the change but warned that the older vessels would need refits to handle the rougher season.\n\n"
        "A spokesperson confirmed the refit budget had already been approved by the board.",
    ),
    (
        66,
        "footnote section is content; markers stay inline",
        """<body><main><article>
        <h1>A short history of the harbour crossing</h1>
        <p>The first regular crossing was rowed, a service that lasted ninety years before steam replaced muscle<sup>[1]</sup> and cut the journey to eleven minutes.</p>
        <p>The bridge finally opened in 1931, though tolls remained until the debt was cleared two generations later<sup>[2]</sup>.</p>
        <section class="footnotes"><h2>Notes</h2>
        <ol>
        <li>Rowing logs survive in the maritime museum archive.</li>
        <li>The toll abolition ceremony drew a larger crowd than the opening.</li>
        </ol></section>
        </article></main></body>""",
        "A short history of the harbour crossing\n\n"
        "The first regular crossing was rowed, a service that lasted ninety years before steam replaced muscle[1] and cut the journey to eleven minutes.\n\n"
        "The bridge finally opened in 1931, though tolls remained until the debt was cleared two generations later[2].\n\n"
        "Notes\n\n"
        "Rowing logs survive in the maritime museum archive.\n\n"
        "The toll abolition ceremony drew a larger crowd than the opening.",
    ),
    (
        67,
        "photo gallery: captions are content, per-figure share links are not",
        """<body><main><article>
        <h1>The harbour in five photographs</h1>
        <p>Our photographer spent a week on the quays; these are the frames the editors could not stop arguing about.</p>
        <figure><img src="/g/1.jpg" alt=""><figcaption>Dawn fog lifting off the container cranes, seen from the pilot boat.</figcaption>
        <div class="share-row"><a href="/share?1">Share</a> <a href="/dl/1">Download</a></div></figure>
        <figure><img src="/g/2.jpg" alt=""><figcaption>The last steam tug under its own power, photographed on her final run.</figcaption>
        <div class="share-row"><a href="/share?2">Share</a> <a href="/dl/2">Download</a></div></figure>
        </article></main></body>""",
        "The harbour in five photographs\n\n"
        "Our photographer spent a week on the quays; these are the frames the editors could not stop arguing about.\n\n"
        "Dawn fog lifting off the container cranes, seen from the pilot boat.\n\n"
        "The last steam tug under its own power, photographed on her final run.",
    ),
    (
        68,
        "per-comment article elements under a comments section stay chrome",
        """<body><main><article>
        <h1>Opinion: the quay belongs to pedestrians</h1>
        <p>Closing the quay road to cars would cost four minutes of driving and return a kilometre of waterfront to the people who actually use it.</p>
        <p>Every city that has tried it reports the same sequence: protest, trial, and then quiet astonishment that it was ever controversial.</p>
        </article>
        <section class="comments"><h3>42 comments</h3>
        <article class="comment"><header><a href="/u/9">quayfan</a></header><p>Completely agree, the trial cannot come soon enough.</p></article>
        <article class="comment"><header><a href="/u/3">driver77</a></header><p>Four minutes is optimistic in rush hour.</p></article>
        </section></main></body>""",
        "Opinion: the quay belongs to pedestrians\n\n"
        "Closing the quay road to cars would cost four minutes of driving and return a kilometre of waterfront to the people who actually use it.\n\n"
        "Every city that has tried it reports the same sequence: protest, trial, and then quiet astonishment that it was ever controversial.",
    ),
    (
        69,
        "chat transcript page: speakers and messages are the content",
        """<body><main><article>
        <h1>Transcript: radio traffic from the grounding</h1>
        <p>The following exchange between the pilot and harbour control was released by the investigation board.</p>
        <dl class="transcript">
        <dt>Pilot (08:14)</dt><dd>We are losing steerage in the bend, request a tug to standby.</dd>
        <dt>Control (08:15)</dt><dd>Tug Hercules is five minutes out, hold your line as long as you can.</dd>
        <dt>Pilot (08:17)</dt><dd>We are aground, soft bottom, no injuries, engines stopped.</dd>
        </dl>
        </article></main></body>""",
        "Transcript: radio traffic from the grounding\n\n"
        "The following exchange between the pilot and harbour control was released by the investigation board.\n\n"
        "Pilot (08:14)\n\n"
        "We are losing steerage in the bend, request a tug to standby.\n\n"
        "Control (08:15)\n\n"
        "Tug Hercules is five minutes out, hold your line as long as you can.\n\n"
        "Pilot (08:17)\n\n"
        "We are aground, soft bottom, no injuries, engines stopped.",
    ),
    (
        70,
        "in-article table of contents nav stripped, body headings kept",
        """<body><main><article>
        <h1>Complete guide to winter sailing</h1>
        <nav class="toc"><h2>Contents</h2><ol><li><a href="#clothing">Clothing</a></li><li><a href="#daylight">Daylight</a></li><li><a href="#ice">Ice</a></li></ol></nav>
        <h2 id="clothing">Clothing</h2>
        <p>Layers beat bulk: a windproof shell over wool keeps spray out without stealing the movement you need at the tiller.</p>
        <h2 id="daylight">Daylight</h2>
        <p>Plan passages around the short afternoon light and treat every departure after lunch as a night sail.</p>
        </article></main></body>""",
        "Complete guide to winter sailing\n\n"
        "Clothing\n\n"
        "Layers beat bulk: a windproof shell over wool keeps spray out without stealing the movement you need at the tiller.\n\n"
        "Daylight\n\n"
        "Plan passages around the short afternoon light and treat every departure after lunch as a night sail.",
    ),
    (
        71,
        "truncated teaser: hidden full body never leaks, teaser is content",
        """<body><main><article>
        <h1>Inquiry findings published</h1>
        <p class="teaser">The inquiry found that the collision was caused by a misread signal, compounded by fatigue on the night shift. Continue reading below.</p>
        <div class="full-body" style="display:none">
        <p>Subscribers see this full text only after the metered script flips the style, which a crawler never executes.</p>
        <p>The complete timeline spans fourteen pages of radio logs.</p>
        </div>
        </article></main></body>""",
        "Inquiry findings published\n\n"
        "The inquiry found that the collision was caused by a misread signal, compounded by fatigue on the night shift. Continue reading below.",
    ),
    (
        72,
        "CMS div-paragraphs: article with no p tags at all",
        """<body><main><article>
        <h1>Port authority elects a new chair</h1>
        <div class="paragraph">The board elected its first chair from the pilotage service, ending a century of appointments from the shipping lines.</div>
        <div class="paragraph">Her first act was to publish the berth allocation ledger, a document the port had treated as confidential since 1962.</div>
        </article></main></body>""",
        "Port authority elects a new chair\n\n"
        "The board elected its first chair from the pilotage service, ending a century of appointments from the shipping lines.\n\n"
        "Her first act was to publish the berth allocation ledger, a document the port had treated as confidential since 1962.",
    ),
    (
        73,
        "sponsored-content label and disclosure box stripped, body kept",
        """<body><main><article>
        <div class="sponsor-label">Sponsored content</div>
        <h1>Five habits of careful skippers</h1>
        <p>Careful skippers brief the crew before leaving the berth, because the manoeuvre everyone understands is the one that goes quietly right.</p>
        <p>They also log engine hours religiously; the pattern in the numbers warns long before the smell of hot oil does.</p>
        <div class="disclosure sponsor">This article was paid for by Harbour Insurance Ltd. Our editorial team had no role in its production.</div>
        </article></main></body>""",
        "Five habits of careful skippers\n\n"
        "Careful skippers brief the crew before leaving the berth, because the manoeuvre everyone understands is the one that goes quietly right.\n\n"
        "They also log engine hours religiously; the pattern in the numbers warns long before the smell of hot oil does.",
    ),
    (
        74,
        "language switcher and hreflang alternates stripped",
        """<body>
        <nav class="lang-switch"><a href="/nl/">Nederlands</a> <a href="/de/">Deutsch</a> <a href="/fr/">Fran\u00e7ais</a></nav>
        <main><article>
        <h1>Ice season opens two weeks early</h1>
        <p>The icebreaker fleet began escort duty on Monday, the earliest start since records began, after a cold snap froze the inner anchorage.</p>
        </article></main>
        <div class="footer-langs"><a hreflang="sv" href="/sv/">Svenska</a> <a hreflang="fi" href="/fi/">Suomi</a></div>
        </body>""",
        "Ice season opens two weeks early\n\n"
        "The icebreaker fleet began escort duty on Monday, the earliest start since records began, after a cold snap froze the inner anchorage.",
    ),
    (
        75,
        "inline newsletter signup card mid-article stripped",
        """<body><main><article>
        <h1>Dredger returns after refit</h1>
        <p>The dredger returned to the channel on Thursday with new pumps that cut a full day from the weekly maintenance cycle.</p>
        <div class="newsletter-card"><h4>Stay informed</h4><p>Get the harbour briefing in your inbox every morning.</p><input placeholder="you@example.com"><button>Sign up</button></div>
        <p>Channel depth surveys resume next week, and the results will set the draft limits for the winter schedule.</p>
        </article></main></body>""",
        "Dredger returns after refit\n\n"
        "The dredger returned to the channel on Thursday with new pumps that cut a full day from the weekly maintenance cycle.\n\n"
        "Channel depth surveys resume next week, and the results will set the draft limits for the winter schedule.",
    ),
    (
        76,
        "trending rail and weather widget in sidebar stripped",
        """<body><main>
        <article>
        <h1>Night ferry timetable consultation opens</h1>
        <p>Residents have six weeks to comment on the proposal to end the two o'clock sailing, which the operator says carries eleven passengers on an average night.</p>
        </article>
        <div class="sidebar"><h3>Trending</h3><ol><li><a href="/t/1">Bridge repair delayed again</a></li><li><a href="/t/2">Marina fees to rise</a></li></ol>
        <div class="weather-widget">Harbour now: 4\u00b0C, wind NW 6, visibility good</div></div>
        </main></body>""",
        "Night ferry timetable consultation opens\n\n"
        "Residents have six weeks to comment on the proposal to end the two o'clock sailing, which the operator says carries eleven passengers on an average night.",
    ),
    (
        77,
        "carousel clone slides marked aria-hidden never double the text",
        """<body><main><article>
        <h1>Three views of the new lock</h1>
        <div class="carousel">
        <div class="slide">From the water the gates look impossibly thin, a trick of the tapered steel.</div>
        <div class="slide clone" aria-hidden="true">From the water the gates look impossibly thin, a trick of the tapered steel.</div>
        </div>
        <p>The lock opens to traffic in May, six weeks ahead of the contract date.</p>
        </article></main></body>""",
        "Three views of the new lock\n\n"
        "From the water the gates look impossibly thin, a trick of the tapered steel.\n\n"
        "The lock opens to traffic in May, six weeks ahead of the contract date.",
    ),
    (
        78,
        "microdata content attributes never leak, visible itemprop text kept",
        """<body><main><article itemscope itemtype="https://schema.org/Product">
        <h1 itemprop="name">Harbour chart, 2024 edition</h1>
        <meta itemprop="sku" content="CH-2024-11">
        <meta itemprop="priceCurrency" content="EUR">
        <p itemprop="description">The 2024 edition adds the dredged approach channel and corrects the charted depth over the old training wall.</p>
        <p>Price: <span itemprop="price" content="12.99">\u20ac12.99</span> including the digital raster download.</p>
        </article></main></body>""",
        "Harbour chart, 2024 edition\n\n"
        "The 2024 edition adds the dredged approach channel and corrects the charted depth over the old training wall.\n\n"
        "Price: \u20ac12.99 including the digital raster download.",
    ),
    (
        79,
        "jump-to-top links between sections stripped, headings kept",
        """<body><main><article>
        <h1 id="top">Mooring fees explained</h1>
        <h2>Visitor berths</h2>
        <p>Visitor berths are charged by length overall per night, with the third night free outside the festival weeks.</p>
        <p class="top-link"><a href="#top">\u2191 Back to top</a></p>
        <h2>Annual contracts</h2>
        <p>Annual contracts include winter storage ashore, which is where the real value hides for boats under ten metres.</p>
        <p class="top-link"><a href="#top">\u2191 Back to top</a></p>
        </article></main></body>""",
        "Mooring fees explained\n\n"
        "Visitor berths\n\n"
        "Visitor berths are charged by length overall per night, with the third night free outside the festival weeks.\n\n"
        "Annual contracts\n\n"
        "Annual contracts include winter storage ashore, which is where the real value hides for boats under ten metres.",
    ),
    (
        80,
        "blockquote attribution via cite element stays with the quote",
        """<body><main><article>
        <h1>Harbourmaster reflects on forty years</h1>
        <p>At her retirement reception the harbourmaster was asked what had changed most in four decades on the quay.</p>
        <blockquote><p>The ships got bigger and the margins got smaller, but the water never learned to forgive carelessness.</p>
        <p>\u2014 <cite>Marta Lindqvist</cite>, harbourmaster 1984\u20132024</p></blockquote>
        </article></main></body>""",
        "Harbourmaster reflects on forty years\n\n"
        "At her retirement reception the harbourmaster was asked what had changed most in four decades on the quay.\n\n"
        "The ships got bigger and the margins got smaller, but the water never learned to forgive carelessness.\n\n"
        "\u2014 Marta Lindqvist, harbourmaster 1984\u20132024",
    ),
    (
        81,
        "abbr expansions live in title attributes and never leak",
        """<body><main><article>
        <h1>Transponder rules tighten</h1>
        <p>An <abbr title="Automatic Identification System">AIS</abbr> transponder becomes mandatory inside the breakwater from May, aligning the port with <abbr title="International Maritime Organization">IMO</abbr> guidance.</p>
        </article></main></body>""",
        "Transponder rules tighten\n\n"
        "An AIS transponder becomes mandatory inside the breakwater from May, aligning the port with IMO guidance.",
    ),
    (
        82,
        "editorial corrections: del text retracted, ins text is current",
        """<body><main><article>
        <h1>Capacity figure corrected</h1>
        <p>The ferry carries <del>three hundred</del> <ins>three hundred and forty</ins> passengers at winter loading, the operator said in an amended statement.</p>
        <p>An earlier version of this article understated the certified capacity.</p>
        </article></main></body>""",
        "Capacity figure corrected\n\n"
        "The ferry carries three hundred and forty passengers at winter loading, the operator said in an amended statement.\n\n"
        "An earlier version of this article understated the certified capacity.",
    ),
    (
        83,
        "client-side template markup never leaks, server-rendered text does",
        """<body><main><article>
        <h1>Berth availability board goes live</h1>
        <p>The availability board now updates from the mooring sensors directly, replacing the morning chalkboard after a hundred and nine years.</p>
        <template id="row-tpl"><div class="row"><span class="berth">{{berth}}</span><span class="state">{{state}}</span> placeholder row never rendered</div></template>
        <p>Sensor data lags by at most ninety seconds, the port's IT office says.</p>
        </article></main></body>""",
        "Berth availability board goes live\n\n"
        "The availability board now updates from the mooring sensors directly, replacing the morning chalkboard after a hundred and nine years.\n\n"
        "Sensor data lags by at most ninety seconds, the port's IT office says.",
    ),
    (
        84,
        "mega-chrome page: tiny article survives cookie wall, sticky bars",
        """<body>
        <div class="cookie-banner">We and our 142 partners use cookies to personalise content. <button>Accept all</button> <button>Manage options</button></div>
        <header class="masthead sticky"><a href="/">The Quay Times</a><nav><a href="/news">News</a><a href="/sport">Sport</a><a href="/weather">Weather</a><a href="/tides">Tides</a></nav></header>
        <div class="app-banner">Read this in the app — faster, offline, push alerts. <a href="/app">Install</a></div>
        <main><article>
        <h1>Pilot boat renamed after retiring coxswain</h1>
        <p>The relief pilot boat will carry the name Anna Viksten from May, honouring thirty-one years of service on the approaches.</p>
        </article></main>
        <div class="newsletter-footer">Get the morning briefing. <input placeholder="email"><button>Subscribe</button></div>
        <footer><a href="/about">About</a> <a href="/privacy">Privacy</a> <a href="/terms">Terms</a> &copy; 2024</footer>
        </body>""",
        "Pilot boat renamed after retiring coxswain\n\n"
        "The relief pilot boat will carry the name Anna Viksten from May, honouring thirty-one years of service on the approaches.",
    ),
    (
        85,
        "hidden print-only duplicate never doubles the article",
        """<body><main>
        <article class="screen-version">
        <h1>Lock gates to close for survey</h1>
        <p>Divers will survey the mitre seals on Thursday morning, closing the lock to all traffic between six and eleven.</p>
        </article>
        <article class="print-version" style="display:none">
        <h1>Lock gates to close for survey</h1>
        <p>Divers will survey the mitre seals on Thursday morning, closing the lock to all traffic between six and eleven.</p>
        <p>Printed from The Quay Times on demand.</p>
        </article>
        </main></body>""",
        "Lock gates to close for survey\n\n"
        "Divers will survey the mitre seals on Thursday morning, closing the lock to all traffic between six and eleven.",
    ),
    (
        86,
        "unified diff in pre keeps its +/- line structure",
        """<body><main><article>
        <h1>Patch notes: harbour API v2.3</h1>
        <p>The tide endpoint now reports heights relative to chart datum, a one-line change with a long migration tail.</p>
        <pre class="diff">-    height = tide_m + MSL_OFFSET
+    height = tide_m  # chart datum, breaking change
     return round(height, 2)</pre>
        <p>Clients pinning the old behaviour can pass datum=msl until v3.</p>
        </article></main></body>""",
        "Patch notes: harbour API v2.3\n\n"
        "The tide endpoint now reports heights relative to chart datum, a one-line change with a long migration tail.\n\n"
        '''-    height = tide_m + MSL_OFFSET
+    height = tide_m  # chart datum, breaking change
     return round(height, 2)'''
        "\n\n"
        "Clients pinning the old behaviour can pass datum=msl until v3.",
    ),
    (
        87,
        "nested blockquotes: the quote within the quote is content",
        """<body><main><article>
        <h1>Letters: on the proposed marina</h1>
        <p>A reader responds to last week's editorial.</p>
        <blockquote><p>Your editorial claimed the marina would, and I quote,</p>
        <blockquote><p>pay for itself within a decade through berth fees alone,</p></blockquote>
        <p>which no published business case supports.</p></blockquote>
        </article></main></body>""",
        "Letters: on the proposed marina\n\n"
        "A reader responds to last week's editorial.\n\n"
        "Your editorial claimed the marina would, and I quote,\n\n"
        "pay for itself within a decade through berth fees alone,\n\n"
        "which no published business case supports.",
    ),
    (
        88,
        "glossary with dfn terms: definitions read inline",
        """<body><main><article>
        <h1>Glossary of mooring terms</h1>
        <p>A <dfn>spring line</dfn> runs diagonally from bow or stern to stop the boat surging along the berth.</p>
        <p>A <dfn>fender board</dfn> hangs outside the fenders against a piled quay, spreading point loads that would burst a fender.</p>
        </article></main></body>""",
        "Glossary of mooring terms\n\n"
        "A spring line runs diagonally from bow or stern to stop the boat surging along the berth.\n\n"
        "A fender board hangs outside the fenders against a piled quay, spreading point loads that would burst a fender.",
    ),
    (
        89,
        "terms-of-service nested ordered clauses are content",
        """<body><main><article>
        <h1>Berthing terms</h1>
        <ol>
        <li>Vessels berth at the owner's risk, and the harbour office must hold current insurance details before arrival.</li>
        <li>Fees are due in advance and include the following services:
        <ol><li>Fresh water at every pontoon, metered above forty litres per day.</li>
        <li>Shore power where fitted, billed by the meter at cost.</li></ol></li>
        <li>Abandoned vessels may be sold after ninety days of unpaid fees and two written notices.</li>
        </ol>
        </article></main></body>""",
        "Berthing terms\n\n"
        "Vessels berth at the owner's risk, and the harbour office must hold current insurance details before arrival.\n\n"
        "Fees are due in advance and include the following services:\n\n"
        "Fresh water at every pontoon, metered above forty litres per day.\n\n"
        "Shore power where fitted, billed by the meter at cost.\n\n"
        "Abandoned vessels may be sold after ninety days of unpaid fees and two written notices.",
    ),
    (
        90,
        "event page: whenwhere details kept, calendar buttons stripped",
        """<body><main><article>
        <h1>Open ship day aboard the lightvessel</h1>
        <p>The restored lightvessel opens to visitors on the first Saturday of May, with the engine room fired up twice a day.</p>
        <dl><dt>When</dt><dd>Saturday 4 May, 10:00 to 17:00</dd>
        <dt>Where</dt><dd>Museum quay, berth 3, free entry</dd></dl>
        <div class="event-widget"><button>Add to calendar</button> <a href="/ics">Download .ics</a> <a href="/share-event" class="share">Share event</a></div>
        </article></main></body>""",
        "Open ship day aboard the lightvessel\n\n"
        "The restored lightvessel opens to visitors on the first Saturday of May, with the engine room fired up twice a day.\n\n"
        "When\n\n"
        "Saturday 4 May, 10:00 to 17:00\n\n"
        "Where\n\n"
        "Museum quay, berth 3, free entry",
    ),
    (
        91,
        "debug error page: the stack trace in pre is the page's content",
        """<body><main>
        <h1>500 Internal Server Error</h1>
        <p>The tide service failed while rendering this page; the trace below was captured for the operators.</p>
        <pre>TideError: no reading for station 7
  at Station.latest (tides.js:88)
  at render (page.js:14)</pre>
        </main></body>""",
        "500 Internal Server Error\n\n"
        "The tide service failed while rendering this page; the trace below was captured for the operators.\n\n"
        '''TideError: no reading for station 7
  at Station.latest (tides.js:88)
  at render (page.js:14)''',
    ),
    (
        92,
        "store locator: the address list is the content",
        """<body><main><article>
        <h1>Chandlery branches</h1>
        <ul class="branches">
        <li>Harbour East — 14 Quayside Walk, open seven days, slipway parking at the rear.</li>
        <li>Harbour West — Unit 3, Drydock Road, closed Mondays outside the season.</li>
        <li>Marina store — pontoon C kiosk, card only, first hour of chandlery delivery free.</li>
        </ul>
        </article></main></body>""",
        "Chandlery branches\n\n"
        "Harbour East \u2014 14 Quayside Walk, open seven days, slipway parking at the rear.\n\n"
        "Harbour West \u2014 Unit 3, Drydock Road, closed Mondays outside the season.\n\n"
        "Marina store \u2014 pontoon C kiosk, card only, first hour of chandlery delivery free.",
    ),
    (
        93,
        "documentation admonition boxes are content",
        """<body><main><article>
        <h1>Filling the water tank</h1>
        <p>Connect the deck fill to the tank the long way round so the hose never kinks behind the galley bulkhead.</p>
        <div class="admonition note"><p>Note: the breather exits under the rubbing strake; a blocked breather makes the tank gulp and spit.</p></div>
        <div class="admonition warning"><p>Warning: never pressurise the tank from the dockside tap, the seams are soldered not welded.</p></div>
        </article></main></body>""",
        "Filling the water tank\n\n"
        "Connect the deck fill to the tank the long way round so the hose never kinks behind the galley bulkhead.\n\n"
        "Note: the breather exits under the rubbing strake; a blocked breather makes the tank gulp and spit.\n\n"
        "Warning: never pressurise the tank from the dockside tap, the seams are soldered not welded.",
    ),
    (
        94,
        "interview QA: speaker labels and answers both content",
        """<body><main><article>
        <h1>Five questions for the new pilot</h1>
        <p><strong>You trained on the river \u2014 what changes at sea?</strong></p>
        <p>The margins. On the river the bank forgives you a metre; the bar at spring ebb forgives nothing.</p>
        <p><strong>First ship you ever brought in?</strong></p>
        <p>A timber coaster drawing four metres on a falling tide, and I can still draw her wheelhouse from memory.</p>
        </article></main></body>""",
        "Five questions for the new pilot\n\n"
        "You trained on the river \u2014 what changes at sea?\n\n"
        "The margins. On the river the bank forgives you a metre; the bar at spring ebb forgives nothing.\n\n"
        "First ship you ever brought in?\n\n"
        "A timber coaster drawing four metres on a falling tide, and I can still draw her wheelhouse from memory.",
    ),
    (
        95,
        "timeline with time elements: visible dates kept, datetime attrs never leak",
        """<body><main><article>
        <h1>How the breakwater was built</h1>
        <ul class="timeline">
        <li><time datetime="1898-03-14">March 1898</time> \u2014 first stone laid by the harbour commissioners after forty years of petitions.</li>
        <li><time datetime="1905-11-02">November 1905</time> \u2014 the great storm carried away two hundred metres and the insurers with it.</li>
        <li><time datetime="1911-07-01">July 1911</time> \u2014 completed to the revised design, which still stands.</li>
        </ul>
        </article></main></body>""",
        "How the breakwater was built\n\n"
        "March 1898 \u2014 first stone laid by the harbour commissioners after forty years of petitions.\n\n"
        "November 1905 \u2014 the great storm carried away two hundred metres and the insurers with it.\n\n"
        "July 1911 \u2014 completed to the revised design, which still stands.",
    ),
]
