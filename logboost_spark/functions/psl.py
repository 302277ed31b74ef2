"""Public-suffix list matcher (tldparserr stand-in, tldparserr/
tld_parser.go:5-46 over the generated map in tldparserr/tld_data.go).

Implements the publicsuffix.org matching algorithm over an embedded,
curated snapshot of the public list (the full generated artifact is 10k
lines in the reference; this module carries the ICANN TLDs + the
multi-label registry suffixes + wildcard/exception rules + the
widely-used PRIVATE-section hosts, which covers every label shape the
algorithm distinguishes). Rules:

* a rule matches when its labels equal the domain's tail labels;
  ``*`` matches exactly one label at that position;
* an exception rule (``!`` prefix) wins outright and its public suffix
  drops the leftmost label;
* otherwise the rule with the most labels wins;
* no matching rule → ``none`` (the reference's map covers the full IANA
  zone set, so an unmatched TLD means "not a real domain" — we mirror
  that rather than the spec's implicit ``*`` default).

The registrable domain ("main.tld", helpers/helpers.go:437-444) is the
public suffix plus one preceding label; nothing before the suffix →
``none``.
"""

from __future__ import annotations

# --- ICANN section: single-label TLDs (ccTLDs + common gTLDs) --------------
_CC_TLDS = """
ac ad ae af ag ai al am ao aq ar as at au aw ax az ba bb be bf bg bh bi bj
bm bn bo br bs bt bw by bz ca cc cd cf cg ch ci cl cm cn co cr cu cv cw cx
cy cz de dj dk dm do dz ec ee eg es et eu fi fj fm fo fr ga gd ge gf gg gh
gi gl gm gn gp gq gr gs gt gu gw gy hk hm hn hr ht hu id ie il im in io iq
ir is it je jo jp ke kg ki km kn kp kr kw ky kz la lb lc li lk lr ls lt lu
lv ly ma mc md me mg mh mk ml mn mo mp mq mr ms mt mu mv mw mx my mz na nc
ne nf ng ni nl no nr nu nz om pa pe pf ph pk pl pm pn pr ps pt pw py qa re
ro rs ru rw sa sb sc sd se sg sh si sk sl sm sn so sr ss st su sv sx sy sz
tc td tf tg th tj tk tl tm tn to tr tt tv tw tz ua ug uk us uy uz va vc ve
vg vi vn vu wf ws ye yt za zm zw
""".split()

_GTLDS = """
com net org edu gov mil int info biz name pro mobi asia tel jobs travel
cat coop aero museum post xxx app dev page day new art auto bank bar bio
blog boutique build business cafe camera camp capital cards care careers
cash casino center chat cheap church city claims cleaning clinic clothing
cloud club codes coffee community company computer condos construction
consulting contractors cool coupons credit creditcard cruises dance dating
deals degree delivery democrat dental design diamonds digital direct
directory discount dog domains education email energy engineer engineering
enterprises equipment estate events exchange expert exposed express fail
farm finance financial fish fitness flights florist fund furniture futbol
fyi gallery games gift gifts gives glass global gold golf graphics gratis
green gripe group guide guru haus healthcare hockey holdings holiday host
hosting house immo industries institute insure international investments
jewelry kitchen land lease legal life lighting limited limo live loan
loans lol ltd maison management market marketing media memorial money
mortgage movie network news ninja online partners parts photo photography
photos pictures pizza place plumbing plus press productions properties
pub recipes red rehab reisen rentals repair report rest restaurant review
reviews rocks run sale salon school schule science services shoes shop
shopping show singles site ski soccer social software solar solutions
space store stream studio style supplies supply support surf surgery
systems tax taxi team tech technology tennis theater tienda tips tires
today tools top tours town toys trade training university vacations
ventures vet viajes video villas vin vision vote voyage watch website
wedding wiki win wine works world wtf xyz zone
""".split()

# --- ICANN section: multi-label registry suffixes ---------------------------
_SECOND_LEVEL = """
co.uk ac.uk gov.uk org.uk net.uk sch.uk nhs.uk police.uk mod.uk ltd.uk
plc.uk me.uk
com.au net.au org.au edu.au gov.au asn.au id.au
co.jp or.jp ne.jp ac.jp ad.jp ed.jp go.jp gr.jp lg.jp
com.br net.br org.br gov.br edu.br mil.br art.br blog.br eco.br
co.za org.za net.za gov.za ac.za web.za
co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz gen.nz kiwi.nz maori.nz
co.in net.in org.in firm.in gen.in ind.in nic.in ac.in edu.in res.in gov.in mil.in
com.cn net.cn org.cn gov.cn edu.cn ac.cn mil.cn
com.mx net.mx org.mx edu.mx gob.mx
com.ar net.ar org.ar edu.ar gob.ar int.ar mil.ar tur.ar
co.kr ne.kr or.kr re.kr pe.kr go.kr ac.kr mil.kr hs.kr ms.kr es.kr kg.kr sc.kr
com.tw net.tw org.tw edu.tw gov.tw idv.tw game.tw ebiz.tw club.tw
com.hk net.hk org.hk edu.hk gov.hk idv.hk
com.sg net.sg org.sg edu.sg gov.sg per.sg
co.il org.il net.il ac.il gov.il muni.il idf.il k12.il
com.tr net.tr org.tr edu.tr gov.tr biz.tr info.tr web.tr av.tr dr.tr pol.tr bel.tr
com.ua net.ua org.ua edu.ua gov.ua in.ua kiev.ua lviv.ua od.ua
com.pl net.pl org.pl edu.pl gov.pl info.pl waw.pl wroc.pl krakow.pl
co.id net.id or.id web.id ac.id go.id sch.id mil.id biz.id my.id
co.th net.th or.th ac.th go.th in.th mi.th
com.my net.my org.my edu.my gov.my mil.my name.my
com.ph net.ph org.ph edu.ph gov.ph mil.ph i.ph
com.vn net.vn org.vn edu.vn gov.vn int.vn ac.vn biz.vn info.vn name.vn pro.vn health.vn
com.sa net.sa org.sa edu.sa gov.sa med.sa pub.sa sch.sa
co.ae net.ae org.ae ac.ae gov.ae mil.ae sch.ae
com.eg net.eg org.eg edu.eg gov.eg mil.eg sci.eg eun.eg
com.ng net.ng org.ng edu.ng gov.ng i.ng mobi.ng name.ng sch.ng
co.ke or.ke ne.ke go.ke ac.ke sc.ke me.ke mobi.ke info.ke
com.gh edu.gh gov.gh org.gh mil.gh
co.tz or.tz ne.tz go.tz ac.tz sc.tz me.tz mobi.tz info.tz tv.tz
co.ug or.ug ne.ug go.ug ac.ug sc.ug com.ug org.ug
co.zw org.zw gov.zw ac.zw mil.zw
com.pk net.pk org.pk edu.pk gov.pk fam.pk biz.pk web.pk gob.pk gok.pk gon.pk gop.pk gos.pk
com.bd net.bd org.bd edu.bd gov.bd ac.bd mil.bd
com.np net.np org.np edu.np gov.np mil.np aero.np asia.np biz.np coop.np info.np museum.np name.np pro.np
com.kh net.kh org.kh edu.kh gov.kh mil.kh per.kh
com.mm net.mm org.mm edu.mm gov.mm
co.cr or.cr ed.cr fi.cr go.cr sa.cr ac.cr
com.do net.do org.do edu.do gob.do gov.do mil.do sld.do web.do art.do
com.gt net.gt org.gt edu.gt gob.gt mil.gt ind.gt
com.pe net.pe org.pe edu.pe gob.pe mil.pe nom.pe sld.pe
com.uy net.uy org.uy edu.uy gub.uy mil.uy
com.ve net.ve org.ve e12.ve edu.ve gob.ve info.ve mil.ve web.ve
com.bo net.bo org.bo edu.bo gob.bo int.bo mil.bo tv.bo web.bo
com.py net.py org.py edu.py gov.py mil.py coop.py una.py
com.ec net.ec org.ec edu.ec gob.ec info.ec fin.ec k12.ec med.ec mil.ec pro.ec
com.co net.co org.co edu.co gov.co mil.co nom.co arts.co firm.co info.co int.co rec.co web.co
com.ni net.ni org.ni edu.ni gob.ni ac.ni biz.ni info.ni int.ni mil.ni nom.ni web.ni co.ni in.ni
com.sv org.sv edu.sv gob.sv red.sv
com.hn net.hn org.hn edu.hn gob.hn mil.hn
com.pa net.pa org.pa edu.pa gob.pa ac.pa sld.pa abo.pa ing.pa med.pa nom.pa
co.ve co.bw co.ck co.ls co.mz co.ao co.mw co.zm
ltd.co.im plc.co.im
ac.be
gov.it edu.it
co.at or.at ac.at gv.at priv.at
co.hu org.hu info.hu priv.hu sport.hu tm.hu 2000.hu bolt.hu city.hu film.hu
com.ro org.ro tm.ro nt.ro nom.ro info.ro rec.ro arts.ro firm.ro store.ro www.ro
com.ru net.ru org.ru int.ru pp.ru msk.ru spb.ru
com.gr edu.gr net.gr org.gr gov.gr
com.pt edu.pt gov.pt int.pt net.pt nome.pt org.pt publ.pt
com.es nom.es org.es gob.es edu.es
com.fr asso.fr nom.fr prd.fr tm.fr gouv.fr
com.de com.se
""".split()

# --- ICANN section: wildcard + exception rules ------------------------------
_WILDCARDS = ["*.ck", "*.er", "*.fk", "*.jm", "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp", "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp"]
_EXCEPTIONS = [
    "!www.ck",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
]

# --- PRIVATE section: widely-used delegated suffixes -------------------------
_PRIVATE = """
github.io githubusercontent.com gitlab.io blogspot.com appspot.com
herokuapp.com cloudfront.net web.app firebaseapp.com netlify.app
vercel.app pages.dev workers.dev s3.amazonaws.com elasticbeanstalk.com
azurewebsites.net cloudapp.net fastly.net ngrok.io readthedocs.io
wordpress.com dyndns.org no-ip.org duckdns.org glitch.me onrender.com
surge.sh fly.dev repl.co neocities.org bitballoon.com webflow.io
""".split()

PSL_RULES: tuple[str, ...] = tuple(
    _CC_TLDS + _GTLDS + _SECOND_LEVEL + _WILDCARDS + _EXCEPTIONS + _PRIVATE
)

# compiled: exact rules by label tuple, wildcard tails, exception tails
_EXACT: set[tuple[str, ...]] = set()
_WILD: set[tuple[str, ...]] = set()  # labels AFTER the '*'
_EXC: set[tuple[str, ...]] = set()
for _r in PSL_RULES:
    if _r.startswith("!"):
        _EXC.add(tuple(_r[1:].split(".")))
    elif _r.startswith("*."):
        _WILD.add(tuple(_r[2:].split(".")))
    else:
        _EXACT.add(tuple(_r.split(".")))

_MAX_RULE_LABELS = max(
    max((len(t) for t in _EXACT), default=1),
    max((len(t) + 1 for t in _WILD), default=1),
    max((len(t) for t in _EXC), default=1),
)


def public_suffix(fqdn: str) -> str | None:
    """The matching public suffix of ``fqdn``, or None if no rule matches."""
    if not fqdn:
        return None
    labels = fqdn.lower().rstrip(".").split(".")
    if "" in labels:
        return None
    # exception rules win outright; their suffix drops the leftmost label
    for k in range(min(len(labels), _MAX_RULE_LABELS), 0, -1):
        if tuple(labels[-k:]) in _EXC:
            return ".".join(labels[-k + 1:]) if k > 1 else None
    # longest rule wins; '*' consumes exactly one label
    for k in range(min(len(labels), _MAX_RULE_LABELS), 0, -1):
        tail = tuple(labels[-k:])
        if tail in _EXACT:
            return ".".join(tail)
        if k >= 2 and tuple(labels[-k + 1:]) in _WILD:
            return ".".join(tail)
    return None


def parse_psl_domain(fqdn: str) -> str:
    """Registrable domain ('main.tld'): public suffix + one label.

    'none' when no rule matches or no label remains before the suffix —
    mirroring lb_TLD population (helpers/helpers.go:437-444, 499-505).
    """
    suffix = public_suffix(fqdn)
    if suffix is None:
        return "none"
    labels = fqdn.lower().rstrip(".").split(".")
    n_suf = suffix.count(".") + 1
    if len(labels) <= n_suf:
        return "none"
    return ".".join(labels[-n_suf - 1:])
