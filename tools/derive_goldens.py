#!/usr/bin/env python3
"""Derive golden (doc_id, subj, pred, obj) triples for the fixture corpus.

Independent (Python) derivation of the emission spec in FIXTURES.md §3 from
the reference's committed golden pages — used to cross-check the Scala
engine (GoldenTripleSpec asserts P/R >= 0.95; any discrepancy between this
script and the engine surfaces there and is adjudicated by hand).

APS fixtures: parsed from the committed sliced markdown in /root/reference.
Nature/Science fixtures: literal values from the reference worked example
(main.py:36-86) and the authored synthetic Science page.
"""
import re, sys, os

# main resources (not test): the kg11 golden-check query reads it at
# Verify runtime, so the driver's CORRECTNESS gate covers extraction too
OUT = os.path.join(os.path.dirname(__file__), "..", "src/main/resources/graft/golden/triples.tsv")
REF = "/root/reference"

def clean_ws(s):
    return re.sub(r"\s+", " ", s.strip())

def strip_md_links(s):
    return re.sub(r"\[([^\]]*)\]\([^)]*\)", r"\1", s)

# --- affiliation normalizer (semantics of nature_extractor.py:59-113) ---
def norm_aff(aff):
    country, clean = "", aff
    for pat, ext in [(r",\s*([A-Z]{2,3})$", lambda m: m.group(1)),
                     (r",\s*([A-Z][a-z]+)$", lambda m: m.group(1)),
                     (r",\s*(United States)$", lambda m: "USA"),
                     (r",\s*(United Kingdom)$", lambda m: "UK")]:
        m = re.search(pat, aff)
        if m:
            country = ext(m)
            clean = re.sub(pat, "", aff).strip()
            break
    parts = [p.strip() for p in clean.split(",")][::-1]
    dept = ["department of", "faculty of", "school of", "division of"]
    inst = ""
    for kws in (["University", "Institute", "College", "Academy", "Hospital"],
                ["Center", "Centre", "Laboratory", "Foundation", "BioHub"]):
        for p in parts:
            if any(k in p for k in kws) and not any(d in p.lower() for d in dept):
                inst = p
                break
        if inst:
            break
    if not inst and parts:
        inst = parts[0]
    return inst.strip(), country

MONTHS = ["January","February","March","April","May","June","July","August",
          "September","October","November","December"]

def iso_date(formatted):
    m = re.search(r"(\d{1,2})\s+([A-Za-z]+),?\s+(\d{4})", formatted)
    if not m: return None
    mo = MONTHS.index(m.group(2)) + 1
    return f"{int(m.group(3)):04d}-{mo:02d}-{int(m.group(1)):02d}"

def emit_aps(sliced_path):
    """Parse a sliced APS markdown page into golden triples."""
    lines = open(sliced_path, encoding="utf-8").read().split("\n")
    triples = []
    title = next((l.strip()[2:] for l in lines if l.strip().startswith("# ")), None)

    affil_by_num, unnumbered, email_by_mark = {}, [], {}
    venue = doi = None
    for line in lines:
        st = line.strip()
        cm = re.match(r"^\*?\s*([*†‡§¶#])Contact author:\s*(\S+@\S+)$", st)
        if cm:
            email_by_mark.setdefault(cm.group(1), cm.group(2))
            continue
        am = re.match(r"^\s*\*\s+(\d*)(.+)$", line)
        if am and st.startswith("*"):
            body = clean_ws(strip_md_links(am.group(2)))
            if body and "," in body:
                if am.group(1): affil_by_num[am.group(1)] = body
                else: unnumbered.append(body)
        vm = re.match(r"^(.+?)\s+\*\*\d+\*\*\s*,\s*\S+\s*[–-]\s*\*\*Published\s+([^*]+)\*\*\s*$", st)
        if vm and venue is None:
            venue = (clean_ws(vm.group(1)), clean_ws(vm.group(2)))
        dm = re.search(r"DOI:\s*https://doi\.org/(\S+)", line)
        if dm and doi is None:
            doi = dm.group(1).strip()

    doc = doi
    author_line = next((l for l in lines if "/search/field/author/" in l), "")
    authors = []
    for m in re.finditer(r"\[([^\]]+)\]\([^)]*?/search/field/author/[^)]*\)(?:\s*\[\]\([^)]*\))?\s*([0-9,*†‡§¶#]*)", author_line):
        name = clean_ws(m.group(1))
        marks = [x.strip() for x in m.group(2).split(",") if x.strip()]
        authors.append((name, marks))

    abs_idx = next(i for i, l in enumerate(lines) if l.strip() == "## Abstract")
    abstract = next(clean_ws(l.strip()) for l in lines[abs_idx+1:] if len(l.strip()) > 100)

    triples.append((doc, doc, "hasTitle", clean_ws(title)))
    triples.append((doc, doc, "publishedIn", venue[0]))
    triples.append((doc, doc, "hasDOI", doi))
    triples.append((doc, doc, "publishedOn", iso_date(venue[1])))
    triples.append((doc, doc, "hasAbstract", abstract))

    all_affs = []
    for idx, (name, marks) in enumerate(authors):
        subj = f"author:{name}"
        if affil_by_num:
            affs = [affil_by_num[m] for m in marks if m.isdigit() and m in affil_by_num]
        else:
            affs = list(unnumbered)
        symbol_marks = [m for m in marks if not m.isdigit()]
        email = next((email_by_mark[m] for m in symbol_marks if m in email_by_mark), None)
        is_corr = any(m in email_by_mark for m in symbol_marks)
        if idx == 0 and is_corr: role = "First/Corresponding Author"
        elif idx == 0: role = "First Author"
        elif is_corr: role = "Corresponding Author"
        else: role = "Other Author"
        triples.append((doc, doc, "hasAuthor", subj))
        triples.append((doc, subj, "hasRole", role))
        if is_corr: triples.append((doc, subj, "isCorresponding", "true"))
        if email: triples.append((doc, subj, "hasContactEmail", email))
        for a in affs:
            triples.append((doc, subj, "affiliatedWith", f"inst:{a}"))
            if a not in all_affs: all_affs.append(a)
    for a in all_affs:
        _, c = norm_aff(a)
        if c: triples.append((doc, f"inst:{a}", "locatedIn", c))
    return triples

def emit_nature():
    doc = "https://www.nature.com/articles/s41567-025-02944-3"
    aff1 = "Institute of Physics, École Polytechnique Fédérale de Lausanne (EPFL), Lausanne, Switzerland"
    aff2 = "Center for Quantum Science and Engineering, École Polytechnique Fédérale de Lausanne (EPFL), Lausanne, Switzerland"
    abstract = ("Predicting the dynamical properties of topological matter is a challenging task, "
        "not only in theoretical and experimental settings, but also computationally. Numerical "
        "studies are often constrained to studying simplified models and lattices. Here we propose "
        "a time-dependent correlated ansatz for the dynamical preparation of a quantum-spin-liquid "
        "state on a Rydberg atom simulator. Together with a time-dependent variational Monte Carlo "
        "technique, we can faithfully represent the state of the system throughout the entire "
        "dynamical preparation protocol. We are able to match not only the physically correct form "
        "of the Rydberg atom Hamiltonian but also the relevant lattice topology at system sizes "
        "that exceed current experimental capabilities. This approach gives access to global "
        "quantities such as the topological entanglement entropy, providing insight into the "
        "topological properties of the system. Our results confirm the topological properties of "
        "the state during the dynamical preparation protocol, and deepen our understanding of "
        "topological entanglement dynamics. We show that, while the simulated state exhibits local "
        "properties resembling those of a resonating-valence-bond state, in agreement with "
        "experimental observations, it lacks the latter’s characteristic topological entanglement "
        "entropy signature irrespective of the degree of adiabaticity of the protocol.")
    contributions = ("L.M. wrote the code and performed the simulations. L.M. analysed the data "
        "with the help of Z.D. All authors contributed to the design of the methods and discussed "
        "the results. L.M. prepared the manuscript with input from all authors.")
    t = [(doc, doc, "hasTitle", "Predicting topological entanglement entropy in a Rydberg analogue simulator"),
         (doc, doc, "publishedIn", "Nature Physics"),
         (doc, doc, "publishedOn", "2025-07-28"),
         (doc, doc, "hasAbstract", abstract),
         (doc, doc, "hasContribution", contributions),
         (doc, doc, "hasEqualContribution", "These authors contributed equally: Linda Mauron, Zakari Denis.")]
    roles = [("Linda Mauron", "First Author", False), ("Zakari Denis", "Other Author", False),
             ("Jannes Nys", "Other Author", False), ("Giuseppe Carleo", "Corresponding Author", True)]
    for name, role, corr in roles:
        subj = f"author:{name}"
        t.append((doc, doc, "hasAuthor", subj))
        t.append((doc, subj, "hasRole", role))
        if corr: t.append((doc, subj, "isCorresponding", "true"))
        for a in (aff1, aff2):
            t.append((doc, subj, "affiliatedWith", f"inst:{a}"))
    for a in (aff1, aff2):
        t.append((doc, f"inst:{a}", "locatedIn", "Switzerland"))
    return t

def emit_science():
    doc = "https://www.science.org/doi/10.1126/scitranslmed.test01"
    a1 = "Department of Bioengineering, Stanford University, Stanford, CA, USA"
    a2 = "Chan Zuckerberg BioHub, San Francisco, CA, USA"
    a3 = "Institute of Microbiology, University of Oxford, Oxford, UK"
    a4 = "Division of Gastroenterology, Massachusetts General Hospital, Boston, MA, USA"
    abstract = ("Chronic intestinal inflammation is driven by dysregulated interactions between "
        "the gut microbiota and the mucosal immune system. Here we engineer a commensal bacterial "
        "strain to sense inflammatory markers and secrete interleukin-10 in situ, restoring immune "
        "homeostasis in three mouse models of colitis and in human organoid co-cultures.")
    t = [(doc, doc, "hasTitle", "Engineered probiotics reprogram gut immunity in inflammatory disease"),
         (doc, doc, "publishedIn", "Science Translational Medicine"),
         (doc, doc, "publishedOn", "14 August 2025"),
         (doc, doc, "hasAbstract", abstract),
         (doc, doc, "hasNote", "†: These authors contributed equally to this work."),
         (doc, doc, "hasNote", "*: Corresponding author. Email: tomas.garcia@ox.ac.uk"),
         # A9 funding paragraphs (science_extractor.py:161-166)
         (doc, doc, "hasFunding", "Funding: National Institutes of Health grant "
          "R01-DK123456 (to S.O.); Wellcome Trust Investigator Award 21700/Z/20/Z (to T.G.)."),
         (doc, doc, "hasFunding", "M.-L.C. acknowledges a Stanford Bio-X graduate fellowship.")]
    authors = [
        ("Mei-Ling Chen", "First Author", False, [a1, a2],
         "Conceptualization, Investigation, Writing - original draft"),
        ("Tomás García", "Corresponding Author", True, [a3], "Methodology, Supervision"),
        ("Sarah O'Neill", "Other Author", False, [a4], "Formal analysis")]
    for name, role, corr, affs, credits in authors:
        subj = f"author:{name}"
        t.append((doc, doc, "hasAuthor", subj))
        t.append((doc, subj, "hasRole", role))
        if corr: t.append((doc, subj, "isCorresponding", "true"))
        for a in affs:
            t.append((doc, subj, "affiliatedWith", f"inst:{a}"))
        t.append((doc, subj, "hasCreditRole", credits))
    for a in (a1, a2, a3, a4):
        _, c = norm_aff(a)
        if c: t.append((doc, f"inst:{a}", "locatedIn", c))
    return t

def emit_aps_html_detailed():
    """Golden for the aps_html_detailed.html fixture (strategy-1 DOM
    parse: author anchors + footnote dicts, aps_extractor.py:248-304)."""
    doc = "10.1103/PhysRevLett.130.267401"
    a1 = "Institute of Photonics, Technical University of Warsaw, 00-661 Warsaw, Poland"
    a2 = "Department of Materials Science, National University of Singapore, Singapore 117575, Singapore"
    contact = "Contact author: anna.kowalski@tuw.edu.pl"
    abstract = ("We measure exciton binding energies in monolayer transition-metal "
        "dichalcogenides using broadband magneto-optical spectroscopy and find strong "
        "deviations from the hydrogenic Rydberg series, which we attribute to nonlocal "
        "dielectric screening and band-structure anisotropy in the two-dimensional limit.")
    t = [(doc, doc, "hasTitle", "Excitonic Effects in Two-Dimensional Semiconductors"),
         (doc, doc, "publishedIn", "Physical Review Letters"),
         (doc, doc, "hasDOI", doc),
         (doc, doc, "publishedOn", "2023-06-28"),
         (doc, doc, "hasAbstract", abstract)]
    authors = [
        ("Anna Kowalski", "First/Corresponding Author", True, [a1], [contact]),
        ("Ben Okafor", "Other Author", False, [a1, a2], []),
        ("Chen Wei", "Other Author", False, [a2], [])]
    for name, role, corr, affs, credits in authors:
        subj = f"author:{name}"
        t.append((doc, doc, "hasAuthor", subj))
        t.append((doc, subj, "hasRole", role))
        if corr: t.append((doc, subj, "isCorresponding", "true"))
        for a in affs:
            t.append((doc, subj, "affiliatedWith", f"inst:{a}"))
        for c in credits:
            t.append((doc, subj, "hasCreditRole", c))
    for a in (a1, a2):
        _, c = norm_aff(a)
        if c: t.append((doc, f"inst:{a}", "locatedIn", c))
    return t

def emit_aps_html_meta():
    """Golden for aps_html_meta.html (strategy-3 meta-tag zip, J4)."""
    doc = "10.1103/PhysRevB.99.000001"
    a1 = "Department of Physics, University of Toronto, Toronto, Canada"
    a2 = "Center for Quantum Materials, University of Oslo, Oslo, Norway"
    abstract = ("We report the observation of flat-band ferromagnetism in epitaxial "
        "kagome metal thin films and show that the ordering temperature scales with the "
        "flat-band filling fraction, consistent with a mean-field Stoner picture "
        "renormalized by quantum geometry.")
    # title comes from the <title> selector (tried before the meta
    # fallback, aps_extractor.py:173-179) -> includes the site suffix
    t = [(doc, doc, "hasTitle", "Flat-band magnetism in kagome metal thin films | Phys. Rev. B"),
         (doc, doc, "publishedIn", "Physical Review B"),
         (doc, doc, "hasDOI", doc),
         (doc, doc, "publishedOn", "2024-02-12"),
         (doc, doc, "hasAbstract", abstract)]
    authors = [("Dana Petrov", "First Author", [a1]), ("Emil Haugen", "Other Author", [a2])]
    for name, role, affs in authors:
        subj = f"author:{name}"
        t.append((doc, doc, "hasAuthor", subj))
        t.append((doc, subj, "hasRole", role))
        for a in affs:
            t.append((doc, subj, "affiliatedWith", f"inst:{a}"))
    for a in (a1, a2):
        _, c = norm_aff(a)
        if c: t.append((doc, f"inst:{a}", "locatedIn", c))
    return t

def main():
    triples = []
    triples += emit_aps(f"{REF}/extracted_content.md")          # 10.1103/pyzr-jmvw
    triples += emit_aps(f"{REF}/extracted_content_f961f7e5.md") # 10.1103/9pbp-jzr9
    triples += emit_aps(f"{REF}/clean_extracted.md")            # 10.1103/7x71-8j7k
    triples += emit_nature()
    triples += emit_science()
    triples += emit_aps_html_detailed()
    triples += emit_aps_html_meta()
    seen = set()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        for doc, s, p, o in triples:
            row = (doc, s, p, o)
            if row in seen: continue
            seen.add(row)
            assert "\t" not in s + p + o, row
            f.write(f"{doc}\t{s}\t{p}\t{o}\n")
    print(f"wrote {len(seen)} golden triples to {OUT}")

if __name__ == "__main__":
    main()
