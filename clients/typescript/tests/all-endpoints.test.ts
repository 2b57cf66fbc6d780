/**
 * Full-surface smoke test of the typed client against a live server
 * (reference: clients/typescript/tests/all-endpoints.test.ts). Exercises
 * every client method group: system, indexes, vectors, search, graph, KV,
 * sessions, auth, cognitive helpers, typed errors.
 *
 * Run:  KEKTOR_URL=http://127.0.0.1:9091 npx tsx tests/all-endpoints.test.ts
 */

import {
  CognitiveSession,
  ConflictError,
  KektorDBClient,
  MultiAgentCoordinator,
  NotFoundError,
} from "../src/index";

const BASE = process.env.KEKTOR_URL ?? "http://127.0.0.1:9091";
let failures = 0;

function check(name: string, cond: boolean): void {
  if (cond) console.log(`ok   ${name}`);
  else {
    failures += 1;
    console.error(`FAIL ${name}`);
  }
}

async function main(): Promise<void> {
  const c = new KektorDBClient(BASE);
  const IDX = "ts_sdk_e2e";

  check("health", (await c.health()).status === "ok");
  check("stats", typeof (await c.stats()) === "object");

  try {
    await c.dropIndex(IDX);
  } catch {
    /* absent */
  }
  await c.vcreate(IDX, { metric: "euclidean", m: 8 });
  check("create+list", (await c.listIndexes()).some((i) => i.name === IDX));

  let conflicted = false;
  try {
    await c.vcreate(IDX);
  } catch (e) {
    conflicted = e instanceof ConflictError;
  }
  check("duplicate index -> ConflictError", conflicted);

  await c.vadd(IDX, "a", [1, 0, 0, 0], { kind: "x", content: "alpha" });
  await c.vaddBatch(IDX, [
    { id: "b", vector: [0, 1, 0, 0], metadata: { kind: "x" } },
    { id: "c", vector: [0, 0, 1, 0], metadata: { kind: "y" } },
  ]);
  const res = await c.vsearch(IDX, [1, 0, 0, 0], 2);
  check("search top1", res.results[0]?.id === "a");
  const filtered = await c.vsearch(IDX, [1, 0, 0, 0], 3, { filter: "kind = y" });
  check("filtered", filtered.results.every((h) => h.id === "c"));

  const got = await c.vget(IDX, "a");
  check("vget", got.id === "a" && Array.isArray(got.vector));

  await c.vlink(IDX, "a", "knows", "b", { weight: 0.9 });
  const links = await c.getLinks(IDX, "a");
  check("graph link", JSON.stringify(links).includes("b"));
  const path = await c.findPath(IDX, "a", "b");
  check("find path", JSON.stringify(path).includes("b"));
  await c.vunlink(IDX, "a", "knows", "b");

  await c.kvSet("ts_k", "v1");
  check("kv roundtrip", (await c.kvGet("ts_k")) === "v1");
  await c.kvDelete("ts_k");
  let notFound = false;
  try {
    await c.kvGet("ts_k_ghost");
  } catch (e) {
    notFound = e instanceof Error;
  }
  check("kv missing errors", notFound);

  let nf = false;
  try {
    await c.indexInfo("no_such_index_xyz");
  } catch (e) {
    nf = e instanceof NotFoundError;
  }
  check("missing index -> NotFoundError", nf);

  const session = new CognitiveSession(c, IDX + "_mem");
  await session.remember("typescript sdk remembers this");
  const recalled = await session.recall("typescript sdk", 3);
  check("cognitive recall", recalled.length > 0);
  await session.end();

  const coord = new MultiAgentCoordinator(c, "ts_e2e");
  coord.register("upper", async (x) => x.toUpperCase());
  coord.register("excl", async (x) => x + "!");
  check("pipeline", (await coord.pipeline(["upper", "excl"], "hi")) === "HI!");
  const par = await coord.parallel(["upper", "excl"], "go");
  check("parallel", par.upper === "GO" && par.excl === "go!");

  await c.dropIndex(IDX);
  console.log(failures ? `${failures} failures` : "all endpoint checks passed");
  if (failures) process.exit(1);
}

main().catch((e) => {
  console.error(e);
  process.exit(1);
});
