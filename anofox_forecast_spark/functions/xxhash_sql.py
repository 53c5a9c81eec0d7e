"""DuckDB-SQL replay of Spark's ``xxhash64`` (seed 42), bit-exact.

Purpose: engine-portable verification of the xxhash64 fast paths in the
dedup family (MinHash-LSH signatures, SimHash) — the DuckDB correctness
oracles re-derive the exact JVM hash values so the full pipelines can be
compared bit-for-bit without falling back to the md5 portable mode.

Semantics follow the canonical XXH64 algorithm as implemented by Apache
Spark (``org.apache.spark.sql.catalyst.expressions.XxHash64`` /
``sql/catalyst/.../XXH64.java``): 4-lane 32-byte stripes, 8/4/1-byte tail
rounds, avalanche; multi-argument calls chain each field's hash as the next
seed, and integer arguments use the dedicated ``hashInt`` path. Verified
against ``F.xxhash64`` on randomized inputs in
``tests/test_r4_additions.py``.

All values are HUGEINT in [0, 2^64). 64-bit wrap-around multiplication is
emulated with 32-bit limbs (a full 64x64 product would overflow signed
128-bit HUGEINT); rotations use multiply/divide by powers of two.
Single-use bindings via ``list_transform([expr], name -> body)[1]`` keep
expression growth linear.
"""

M64 = 18446744073709551616  # 2^64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SEED = 42


def LET(expr, name, body):
    return f"list_transform([{expr}], {name} -> {body})[1]"


def _mulc(x, c):
    """(x * c) mod 2^64 for a bound simple operand x and constant c."""
    cl, ch = c % (1 << 32), c >> 32
    return (f"((({x}) % 4294967296) * {cl} "
            f"+ (((({x}) // 4294967296) * {cl} "
            f"+ (({x}) % 4294967296) * {ch}) % 4294967296) "
            f"* 4294967296) % {M64}")


def _rotl(x, r):
    """rotl64 for a bound simple operand x."""
    return (f"((({x}) * {1 << r} % {M64}) + (({x}) // {1 << (64 - r)}))")


def _fmix(h, tag):
    """XXH64 avalanche for a bound simple operand h."""
    a = f"xor(({h}), ({h}) // {1 << 33})"
    b = LET(a, f"fa{tag}", _mulc(f"fa{tag}", P2))
    c = LET(b, f"fb{tag}", f"xor(fb{tag}, fb{tag} // {1 << 29})")
    d = LET(c, f"fc{tag}", _mulc(f"fc{tag}", P3))
    return LET(d, f"fd{tag}", f"xor(fd{tag}, fd{tag} // {1 << 32})")


def _round0(v, tag):
    """xxh64 round with acc=0: rotl(v*P2, 31) * P1, v bound simple."""
    a = _mulc(v, P2)
    b = LET(a, f"ra{tag}", _rotl(f"ra{tag}", 31))
    return LET(b, f"rb{tag}", _mulc(f"rb{tag}", P1))


def _round(acc, inp, tag):
    """full round: rotl(acc + inp*P2, 31) * P1; acc/inp bound simple."""
    a = f"(({acc}) + {LET(_mulc_free(inp, P2, tag), f'ri{tag}', f'ri{tag}')}) % {M64}"
    b = LET(a, f"rc{tag}", _rotl(f"rc{tag}", 31))
    return LET(b, f"rd{tag}", _mulc(f"rd{tag}", P1))


def _mulc_free(x, c, tag):
    """(x * c) mod 2^64 where x may be a compound expression: bind first."""
    return LET(x, f"mx{tag}", _mulc(f"mx{tag}", c))


def read8(b, off0):
    """little-endian u64 at 0-based offset expression off0 (list is 1-based)."""
    terms = " + ".join(
        f"{b}[CAST(({off0}) + {i + 1} AS BIGINT)] * {256 ** i}"
        for i in range(8))
    return f"({terms})"


def read4(b, off0):
    terms = " + ".join(
        f"{b}[CAST(({off0}) + {i + 1} AS BIGINT)] * {256 ** i}"
        for i in range(4))
    return f"({terms})"


def stripe_fold(b, L):
    """CASE-guarded 4-lane stripe fold; returns list [v1,v2,v3,v4] or NULL."""
    v10 = (SEED + P1 + P2) % M64
    v20 = (SEED + P2) % M64
    v30 = SEED % M64
    v40 = (SEED - P1) % M64
    lanes = ", ".join(
        _round(f"acc[{j + 1}]", read8(b, f"x[1] * 32 + {8 * j}"), f"s{j}")
        for j in range(4))
    init = f"[CAST({v10} AS HUGEINT), {v20}, {v30}, {v40}]"
    items = (f"list_transform(range(0, CAST(({L}) // 32 AS BIGINT)), "
             f"i -> [CAST(i AS HUGEINT)])")
    return (f"CASE WHEN ({L}) >= 32 THEN "
            f"list_reduce(list_prepend({init}, {items}), "
            f"(acc, x) -> [{lanes}]) ELSE NULL END")


def merge_expr(sv, L):
    """Combine stripe lanes (or the short-input constant) into the running
    hash before length-add: returns expression over sv (list col) and L."""
    h0 = (f"({_rotl(f'{sv}[1]', 1)} + {_rotl(f'{sv}[2]', 7)} "
          f"+ {_rotl(f'{sv}[3]', 12)} + {_rotl(f'{sv}[4]', 18)}) % {M64}")
    h = h0
    for j in range(4):
        rnd = _round0(f"{sv}[{j + 1}]", f"m{j}")
        h = LET(h, f"mh{j}",
                f"({LET(f'xor(mh{j}, {rnd})', f'mg{j}', _mulc(f'mg{j}', P1))} + {P4}) % {M64}")
    short = (SEED + P5) % M64
    return f"CASE WHEN ({L}) >= 32 THEN {h} ELSE CAST({short} AS HUGEINT) END"


def tail_expr(h_in, b, L):
    """h_in: bound column with merged hash. Applies +L, the <=3 8-byte
    rounds, the optional 4-byte round, and <=3 single bytes, then fmix."""
    h = f"(({h_in}) + ({L})) % {M64}"
    # 8-byte rounds at offsets 32*(L//32) + 8k while offset + 8 <= L
    for k in range(3):
        off = f"(({L}) // 32) * 32 + {8 * k}"
        k1 = read8(b, off)
        rnd = LET(k1, f"tk{k}", _round0(f"tk{k}", f"t{k}"))
        step = LET(f"xor(th{k}, {rnd})", f"tx{k}",
                   f"({LET(_rotl(f'tx{k}', 27), f'tr{k}', _mulc(f'tr{k}', P1))} + {P4}) % {M64}")
        h = LET(h, f"th{k}",
                f"CASE WHEN ({off}) + 8 <= ({L}) THEN {step} ELSE th{k} END")
    # 4-byte round at offset L - L%8 when L%8 >= 4
    off4 = f"({L}) - ({L}) % 8"
    k4 = LET(read4(b, off4), "fk", _mulc("fk", P1))
    step4 = LET(f"xor(fh, {k4})", "fx",
                f"({LET(_rotl('fx', 23), 'fr', _mulc('fr', P2))} + {P3}) % {M64}")
    h = LET(h, "fh", f"CASE WHEN ({L}) % 8 >= 4 THEN {step4} ELSE fh END")
    # single bytes at offsets L - L%4 + j for j < L%4
    for j in range(3):
        off = f"({L}) - ({L}) % 4 + {j}"
        stepb = LET(f"xor(bh{j}, {b}[CAST(({off}) + 1 AS BIGINT)] * {P5} % {M64})", f"bx{j}",
                    LET(_rotl(f"bx{j}", 11), f"br{j}", _mulc(f"br{j}", P1)))
        h = LET(h, f"bh{j}",
                f"CASE WHEN ({L}) % 4 > {j} THEN {stepb} ELSE bh{j} END")
    return LET(h, "av", _fmix("av", "z"))


def hash_int_expr(i_expr, seed_expr):
    """Spark hashInt(i, seed): i a small non-negative int expression."""
    h0 = f"(({seed_expr}) + {P5 + 4}) % {M64}"
    h1 = LET(h0, "ia", f"xor(ia, ({i_expr}) * {P1} % {M64})")
    h2 = LET(h1, "ib",
             f"({LET(_rotl('ib', 23), 'ic', _mulc('ic', P2))} + {P3}) % {M64}")
    return LET(h2, "id_", _fmix("id_", "i"))


def signed(h):
    return (f"CAST(CASE WHEN ({h}) >= 9223372036854775808 "
            f"THEN ({h}) - {M64} ELSE ({h}) END AS BIGINT)")


def byte_list_cols(s_col):
    """Column expressions (hx, L, b) for hashing string column ``s_col``:
    hex form, byte length, and the byte-value list (HUGEINT)."""
    hx = f"hex(encode({s_col}))"
    L = f"CAST(octet_length(encode({s_col})) AS HUGEINT)"
    b = ("list_transform(range(1, CAST(L AS BIGINT) + 1), i -> "
         "CAST(strpos('0123456789ABCDEF', substr(hx, CAST(2 * i - 1 AS INT), 1)) - 1 "
         "AS HUGEINT) * 16 "
         "+ (strpos('0123456789ABCDEF', substr(hx, CAST(2 * i AS INT), 1)) - 1))")
    return hx, L, b


def hash_ctes(src_cte, carry, s_col, out, prefix=""):
    """CTE chain hashing string column ``s_col`` of ``src_cte`` with
    xxhash64(seed 42); emits CTE ``{prefix}fin`` carrying ``carry`` columns
    plus ``{out}`` = the unsigned 64-bit hash (HUGEINT)."""
    hx, L, b = byte_list_cols(s_col)
    p = prefix
    return f"""{p}hb AS (SELECT {carry}, {hx} AS hx, {L} AS L FROM {src_cte}),
{p}bl AS (SELECT {carry}, L, {b} AS b FROM {p}hb),
{p}sv AS (SELECT {carry}, L, b, {stripe_fold('b', 'L')} AS v FROM {p}bl),
{p}mg AS (SELECT {carry}, L, b, {merge_expr('v', 'L')} AS hm FROM {p}sv),
{p}fin AS (SELECT {carry}, {tail_expr('hm', 'b', 'L')} AS {out} FROM {p}mg)"""
