"""Registered-domain extraction with a vendored public-suffix snapshot.

The reference uses ``tldextract`` (distributed_scheduler.py:100-101,
450-459; scraper_handler.py:42-46): queue key domain =
``ex.domain + '.' + ex.suffix`` — public-suffix aware, so
``shop.example.co.uk`` → ``example.co.uk``, NOT ``co.uk``.

tldextract is not installed here and live PSL fetches are forbidden
(determinism — SURVEY.md §7 risk 6), so a fixed snapshot of the common
multi-label suffixes from the public suffix list (publicsuffix.org,
public data) is vendored below.  Single-label TLDs need no table: any
unknown final label is treated as the suffix, which matches tldextract's
fallback behavior for unlisted TLDs closely enough for the synthetic +
test domains used here.
"""

from __future__ import annotations

from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Snapshot of frequent 2/3-label public suffixes (publicsuffix.org).
_MULTI_SUFFIXES = frozenset(
    """
    co.uk org.uk gov.uk ac.uk me.uk net.uk sch.uk ltd.uk plc.uk nhs.uk
    com.au net.au org.au edu.au gov.au id.au asn.au
    co.jp ne.jp or.jp ac.jp ad.jp ed.jp go.jp gr.jp lg.jp
    com.br net.br org.br gov.br edu.br
    co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz gen.nz maori.nz
    co.in net.in org.in firm.in gen.in ind.in gov.in ac.in edu.in res.in
    com.cn net.cn org.cn gov.cn edu.cn ac.cn
    com.mx org.mx net.mx edu.mx gob.mx
    com.ar net.ar org.ar gob.ar edu.ar
    co.za net.za org.za gov.za ac.za web.za
    com.sg net.sg org.sg edu.sg gov.sg per.sg
    com.hk net.hk org.hk edu.hk gov.hk idv.hk
    com.tw net.tw org.tw edu.tw gov.tw idv.tw
    co.kr ne.kr or.kr re.kr go.kr ac.kr pe.kr
    com.tr net.tr org.tr edu.tr gov.tr web.tr
    co.il net.il org.il ac.il gov.il muni.il
    com.ua net.ua org.ua edu.ua gov.ua in.ua
    com.ru net.ru org.ru msk.ru spb.ru
    co.th in.th or.th ac.th go.th net.th
    com.my net.my org.my edu.my gov.my
    com.ph net.ph org.ph edu.ph gov.ph
    com.vn net.vn org.vn edu.vn gov.vn
    com.eg net.eg org.eg edu.eg gov.eg
    com.sa net.sa org.sa edu.sa gov.sa
    com.pk net.pk org.pk edu.pk gov.pk
    com.ng net.ng org.ng edu.ng gov.ng
    co.id net.id or.id ac.id go.id web.id my.id
    com.co net.co org.co edu.co gov.co nom.co
    com.pe net.pe org.pe edu.pe gob.pe
    com.cl cl.cl gob.cl gov.cl
    com.ve net.ve org.ve edu.ve gob.ve
    co.ke ne.ke or.ke ac.ke go.ke
    com.do net.do org.do edu.do gob.do
    com.ec net.ec org.ec edu.ec gob.ec fin.ec
    com.py net.py org.py edu.py gov.py
    com.uy net.uy org.uy edu.uy gub.uy
    com.bo net.bo org.bo edu.bo gob.bo
    com.gt net.gt org.gt edu.gt gob.gt
    gov.it edu.it
    co.at or.at ac.at gv.at
    com.pl net.pl org.pl edu.pl gov.pl waw.pl
    com.pt net.pt org.pt edu.pt gov.pt
    com.gr net.gr org.gr edu.gr gov.gr
    com.ro org.ro tm.ro nt.ro
    co.hu org.hu info.hu
    com.es nom.es org.es gob.es edu.es
    co.no priv.no
    com.se org.se pp.se
    co.dk
    co.ir net.ir org.ir ac.ir gov.ir id.ir sch.ir
    com.kz org.kz edu.kz gov.kz
    com.bd net.bd org.bd edu.bd gov.bd
    com.np net.np org.np edu.np gov.np
    com.lk net.lk org.lk edu.lk gov.lk web.lk
    """.split()
)


def extract_domain(url: str) -> str:
    """Registered domain of ``url`` (tldextract-equivalent for the vendored
    suffix snapshot).  Returns '' when there is no host."""
    if not url:
        return ""
    try:
        host = urlparse(url).hostname or ""
    except ValueError:
        return ""
    host = host.rstrip(".").lower()
    if not host or host.replace(".", "").isdigit():  # bare IPv4 → keep as-is
        return host
    labels = host.split(".")
    if len(labels) < 2:
        return host
    # longest multi-label public suffix match, else final label
    if len(labels) >= 3 and ".".join(labels[-2:]) in _MULTI_SUFFIXES:
        suffix_len = 2
    elif len(labels) >= 4 and ".".join(labels[-3:]) in _MULTI_SUFFIXES:
        suffix_len = 3
    else:
        suffix_len = 1
    return ".".join(labels[-(suffix_len + 1):])


@F.pandas_udf(StringType())
def extract_domain_udf(urls: pd.Series) -> pd.Series:
    return urls.map(extract_domain)
