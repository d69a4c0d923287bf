import duckdb, json, sys, glob, os, math
outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f'{sfdir}/*.parquet'):
    name = os.path.basename(p)[:-8]
    con.sql(f"create view {name} as select * from '{p}'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(round(float(r[i]),6) if isinstance(r[i],float) else (float(r[i]) if str(type(r[i]))=="<class 'decimal.Decimal'>" else r[i]) for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))
fails = 0
for name in sorted(oracle):
    try:
        d = con.sql(f"select * from '{outdir}/{name}/*.parquet'")
        spark_cols = [c.lower() for c in d.columns]; spark_rows = d.fetchall()
        o = con.sql(oracle[name]); o_cols = [c.lower() for c in o.columns]; o_rows = o.fetchall()
        if sorted(spark_cols) != sorted(o_cols):
            print(f"MISMATCH cols {name}: spark={spark_cols} oracle={o_cols}"); fails+=1; continue
        a, b = norm(spark_rows, spark_cols), norm(o_rows, o_cols)
        if len(a) != len(b):
            print(f"MISMATCH rowcount {name}: spark={len(a)} oracle={len(b)}"); fails+=1; continue
        if a != b:
            diff = [(x,y) for x,y in zip(a,b) if x!=y][:3]
            print(f"MISMATCH values {name}: e.g. {diff}"); fails+=1; continue
        print(f"OK {name} ({len(a)} rows)")
    except Exception as e:
        print(f"ERROR {name}: {str(e).splitlines()[0]}"); fails+=1
print("FAILS:", fails)
