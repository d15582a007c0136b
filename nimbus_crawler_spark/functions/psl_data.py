"""Vendored public-suffix snapshot (publicsuffix.org list format, subset).

A deterministic, self-contained snapshot of the well-known entries of the
Public Suffix List — the multi-label ICP rules, wildcard rules, exception
rules, and the common private-section hosting suffixes. Single-label TLDs
that carry no multi-label rules are intentionally omitted: the matcher's
fallback (`unknown TLD ⇒ last label is the suffix`) is the PSL's own `*`
default rule, so omitting them changes nothing.

Swapping in the full upstream list = replacing the three sets below with a
parse of `public_suffix_list.dat` (same rule grammar); the matcher in
``urlnorm.registrable_domain`` implements the complete algorithm (longest
match, `*` = exactly one label, `!` exceptions prevail).
"""

from __future__ import annotations

# exact rules (multi-label public suffixes + single-label entries the tests
# and fixtures rely on)
PSL_RULES: frozenset[str] = frozenset(
    # --- fixture/test TLDs ---
    ["example", "test", "invalid", "localhost"]
    # --- United Kingdom ---
    + ["co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "ac.uk",
       "gov.uk", "nhs.uk", "police.uk", "sch.uk"]
    # --- Australia ---
    + ["com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
       "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au",
       "wa.au"]
    # --- Japan: organizational + prefecture geographic ---
    + ["ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
       "ne.jp", "or.jp"]
    + [f"{p}.jp" for p in (
        "aichi akita aomori chiba ehime fukui fukuoka fukushima gifu gunma "
        "hiroshima hokkaido hyogo ibaraki ishikawa iwate kagawa kagoshima "
        "kanagawa kochi kumamoto kyoto mie miyagi miyazaki nagano nagasaki "
        "nara niigata oita okayama okinawa osaka saga saitama shiga shimane "
        "shizuoka tochigi tokushima tokyo tottori toyama wakayama yamagata "
        "yamaguchi yamanashi"
    ).split()]
    # --- Brazil ---
    + ["com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
       "adv.br", "blog.br", "eco.br", "emp.br", "eng.br", "esp.br", "far.br",
       "flog.br", "fnd.br", "fot.br", "fst.br", "g12.br", "ggf.br", "imb.br",
       "ind.br", "inf.br", "jor.br", "jus.br", "lel.br", "med.br", "mus.br",
       "not.br", "ntr.br", "odo.br", "ppg.br", "pro.br", "psc.br", "psi.br",
       "qsl.br", "rec.br", "slg.br", "srv.br", "tmp.br", "trd.br", "tur.br",
       "tv.br", "vet.br", "vlog.br", "wiki.br", "zlg.br"]
    # --- China ---
    + ["ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn", "mil.cn",
       "bj.cn", "sh.cn", "tj.cn", "cq.cn", "he.cn", "sx.cn", "nm.cn",
       "ln.cn", "jl.cn", "hl.cn", "js.cn", "zj.cn", "ah.cn", "fj.cn",
       "jx.cn", "sd.cn", "ha.cn", "hb.cn", "hn.cn", "gd.cn", "gx.cn",
       "hi.cn", "sc.cn", "gz.cn", "yn.cn", "xz.cn", "sn.cn", "gs.cn",
       "qh.cn", "nx.cn", "xj.cn", "tw.cn", "hk.cn", "mo.cn"]
    # --- India ---
    + ["co.in", "firm.in", "net.in", "org.in", "gen.in", "ind.in", "nic.in",
       "ac.in", "edu.in", "res.in", "gov.in", "mil.in"]
    # --- New Zealand ---
    + ["ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
       "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
       "org.nz", "parliament.nz", "school.nz"]
    # --- South Africa ---
    + ["ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
       "nom.za", "org.za", "school.za", "web.za"]
    # --- South Korea ---
    + ["ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
       "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr", "seoul.kr",
       "busan.kr", "daegu.kr", "incheon.kr", "gwangju.kr", "daejeon.kr",
       "ulsan.kr", "gyeonggi.kr", "gangwon.kr", "jeju.kr"]
    # --- Mexico / Argentina / Chile / Colombia / Peru / Venezuela ---
    + ["com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx"]
    + ["com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar",
       "musica.ar", "tur.ar"]
    + ["gob.cl", "gov.cl", "mil.cl", "co.cl"]
    + ["com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co"]
    + ["com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "mil.pe", "nom.pe"]
    + ["com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve", "mil.ve", "web.ve",
       "co.ve", "info.ve"]
    # --- Turkey ---
    + ["com.tr", "net.tr", "org.tr", "gen.tr", "web.tr", "av.tr", "dr.tr",
       "bbs.tr", "name.tr", "tel.tr", "gov.tr", "bel.tr", "pol.tr", "mil.tr",
       "k12.tr", "edu.tr", "kep.tr"]
    # --- Russia / Ukraine ---
    + ["ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru", "test.ru"]
    + ["com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
       "kiev.ua", "kyiv.ua", "lviv.ua", "odessa.ua", "kharkov.ua"]
    # --- Poland ---
    + ["com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
       "waw.pl", "krakow.pl", "wroclaw.pl", "poznan.pl", "gda.pl",
       "lodz.pl", "slask.pl", "mil.pl", "biz.pl", "shop.pl", "sklep.pl"]
    # --- Israel / Saudi Arabia / UAE / Egypt ---
    + ["ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
       "org.il"]
    + ["com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa", "edu.sa",
       "sch.sa"]
    + ["co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae"]
    + ["com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg", "net.eg",
       "org.eg", "sci.eg"]
    # --- Indonesia / Thailand / Vietnam / Philippines / Malaysia / Singapore ---
    + ["ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
       "net.id", "or.id", "ponpes.id", "sch.id", "web.id"]
    + ["ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th"]
    + ["com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
       "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn"]
    + ["com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph",
       "i.ph"]
    + ["com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my"]
    + ["com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg"]
    # --- Hong Kong / Taiwan / Macau ---
    + ["com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk"]
    + ["com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "mil.tw", "idv.tw",
       "game.tw", "ebiz.tw", "club.tw"]
    + ["com.mo", "net.mo", "org.mo", "edu.mo", "gov.mo"]
    # --- Europe misc ---
    + ["co.at", "or.at", "ac.at", "gv.at", "priv.at"]
    + ["ac.be", "co.nl", "com.de", "com.se", "co.dk", "co.no",
       "priv.no", "co.it", "edu.it", "gov.it"]
    + ["com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr"]
    + ["com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
       "org.pt", "publ.pt"]
    + ["com.es", "nom.es", "org.es", "gob.es", "edu.es"]
    + ["com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
       "arts.ro", "firm.ro", "store.ro", "www.ro"]
    + ["co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu",
       "2000.hu", "bolt.hu", "city.hu", "film.hu"]
    + ["com.cy", "biz.cy", "ekloges.cy", "ltd.cy", "net.cy", "org.cy",
       "press.cy", "pro.cy", "tm.cy"]
    + ["co.ie", "gov.ie"]
    # --- Africa misc ---
    + ["co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
       "mobi.ke", "info.ke"]
    + ["com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng", "name.ng",
       "net.ng", "org.ng", "sch.ng"]
    + ["co.tz", "ac.tz", "go.tz", "hotel.tz", "info.tz", "me.tz", "mil.tz",
       "mobi.tz", "ne.tz", "or.tz", "sc.tz", "tv.tz"]
    + ["co.ug", "or.ug", "ac.ug", "sc.ug", "go.ug", "ne.ug", "com.ug",
       "org.ug"]
    + ["com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh"]
    + ["co.zw", "ac.zw", "gov.zw", "mil.zw", "org.zw"]
    + ["co.ma", "net.ma", "gov.ma", "org.ma", "ac.ma", "press.ma"]
    + ["com.tn", "ens.tn", "fin.tn", "gov.tn", "ind.tn", "info.tn",
       "intl.tn", "mincom.tn", "nat.tn", "net.tn", "org.tn", "perso.tn",
       "tourism.tn"]
    + ["com.dz", "org.dz", "net.dz", "gov.dz", "edu.dz", "asso.dz",
       "pol.dz", "art.dz"]
    # --- Canada provinces ---
    + ["ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
       "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
       "gc.ca"]
    # --- US locality scheme (dc/state second-levels + common third-levels) ---
    + ["dni.us", "fed.us", "isa.us", "kids.us", "nsn.us"]
    + [f"{s}.us" for s in (
        "ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma md me "
        "mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or pa ri sc sd tn tx "
        "ut va vt wa wi wv wy"
    ).split()]
    + [f"{k}.{s}.us" for s in (
        "ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma md me "
        "mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or pa ri sc sd tn tx "
        "ut va vt wa wi wv wy"
    ).split() for k in ("k12", "cc", "lib", "state")]
    # --- private section (hosting platforms) ---
    + ["github.io", "githubusercontent.com", "gitlab.io", "pages.dev",
       "workers.dev", "netlify.app", "vercel.app", "now.sh", "web.app",
       "firebaseapp.com", "appspot.com", "herokuapp.com", "herokussl.com",
       "azurewebsites.net", "cloudapp.net", "cloudfront.net", "fly.dev",
       "onrender.com", "repl.co", "glitch.me", "readthedocs.io",
       "wordpress.com", "blogspot.com", "blogspot.co.uk", "blogspot.de",
       "blogspot.fr", "blogspot.jp", "blogspot.com.au", "blogspot.com.br",
       "blogspot.ca", "blogspot.in", "tumblr.com", "weebly.com", "wix.com",
       "squarespace.com", "fastly-terrarium.com", "s3.amazonaws.com",
       "s3-us-west-2.amazonaws.com", "s3.eu-west-1.amazonaws.com",
       "elb.amazonaws.com", "surge.sh", "neocities.org", "bitballoon.com",
       "linodeobjects.com", "digitaloceanspaces.com"]
)

# wildcard rules: '*' matches exactly one label
PSL_WILDCARDS: frozenset[str] = frozenset(
    ["*.ck", "*.bd", "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np",
     "*.pg", "*.ye", "*.mv",
     "*.sch.uk",
     # Japanese designated cities: wards are public, the city domain is the
     # exception below
     "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
     "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
     # AWS per-region compute hostnames
     "*.compute.amazonaws.com", "*.compute-1.amazonaws.com",
     "*.elb.amazonaws.com", "*.s3.amazonaws.com"]
)

# exception rules: prevail over wildcards; registrable domain = the rule itself
PSL_EXCEPTIONS: frozenset[str] = frozenset(
    ["!www.ck",
     "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
     "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
     "!city.yokohama.jp"]
)
