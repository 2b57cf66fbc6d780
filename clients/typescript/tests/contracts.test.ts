/**
 * Cross-language contract runner: executes testdata/contracts.json against
 * a live KektorDB-TPU server (reference model:
 * clients/typescript/tests/contracts.test.ts + testdata/api_contracts.json
 * — the same declarative steps run from Go, Python and TypeScript so every
 * client observes identical status-code/shape guarantees; the Python twin
 * is tests/test_contracts.py).
 *
 * Run (any node >= 18 with TS support, e.g. tsx):
 *   KEKTOR_URL=http://127.0.0.1:9091 npx tsx tests/contracts.test.ts
 */

import { readFileSync } from "node:fs";
import { join, dirname } from "node:path";
import { fileURLToPath } from "node:url";

interface Step {
  id: string;
  method: string;
  path: string;
  body?: unknown;
  raw_body?: string;
  expect_status: number;
  expect_fields?: string[];
  expect_equals?: Record<string, unknown>;
  expect_contains_name?: string;
  expect_first_id?: string;
  expect_ids_subset?: string[];
  expect_type?: "array" | "object";
  expect_ids_b64_count_matches_shape?: boolean;
}

const BASE = process.env.KEKTOR_URL ?? "http://127.0.0.1:9091";
const here = dirname(fileURLToPath(import.meta.url));
const contractsPath =
  process.env.KEKTOR_CONTRACTS ??
  join(here, "..", "..", "..", "testdata", "contracts.json");

async function runStep(step: Step): Promise<string[]> {
  const errs: string[] = [];
  const init: RequestInit = { method: step.method };
  if (step.raw_body !== undefined) {
    init.body = step.raw_body;
  } else if (step.body !== undefined) {
    init.body = JSON.stringify(step.body);
    init.headers = { "Content-Type": "application/json" };
  }
  const resp = await fetch(BASE + step.path, init);
  if (resp.status !== step.expect_status) {
    errs.push(
      `${step.id}: status ${resp.status} != ${step.expect_status}`,
    );
    return errs;
  }
  const text = await resp.text();
  let data: any = null;
  try {
    data = text ? JSON.parse(text) : null;
  } catch {
    data = text;
  }
  for (const f of step.expect_fields ?? []) {
    if (data == null || !(f in data)) errs.push(`${step.id}: missing field ${f}`);
  }
  for (const [k, v] of Object.entries(step.expect_equals ?? {})) {
    if (data?.[k] !== v) errs.push(`${step.id}: ${k}=${data?.[k]} != ${v}`);
  }
  if (step.expect_contains_name !== undefined) {
    const names = (Array.isArray(data) ? data : data?.indexes ?? []).map(
      (x: any) => x.name ?? x,
    );
    if (!names.includes(step.expect_contains_name))
      errs.push(`${step.id}: ${step.expect_contains_name} not in list`);
  }
  if (step.expect_first_id !== undefined) {
    const first = data?.results?.[0]?.id ?? data?.ids?.[0];
    if (first !== step.expect_first_id)
      errs.push(`${step.id}: first id ${first} != ${step.expect_first_id}`);
  }
  if (step.expect_ids_subset !== undefined) {
    // returned ids must be a subset of the allowed set (filter contracts)
    const ids: string[] =
      data?.ids ?? (data?.results ?? []).map((r: any) => r.id);
    for (const got of ids) {
      if (!step.expect_ids_subset.includes(got))
        errs.push(
          `${step.id}: unexpected id ${got}, allowed ${JSON.stringify(step.expect_ids_subset)}`,
        );
    }
  }
  if (step.expect_ids_b64_count_matches_shape) {
    // the ids blob must decode to exactly shape[0]*shape[1] rows
    const flat = new TextDecoder()
      .decode(Uint8Array.from(atob(data.ids_b64 ?? ""), (c) => c.charCodeAt(0)))
      .split("\n");
    const want = (data.shape?.[0] ?? 0) * (data.shape?.[1] ?? 0);
    if (flat.length !== want)
      errs.push(`${step.id}: ids_b64 decoded ${flat.length} ids, want ${want}`);
  }
  if (step.expect_type === "array" && !Array.isArray(data))
    errs.push(`${step.id}: expected array response`);
  if (step.expect_type === "object" && (data === null || Array.isArray(data)))
    errs.push(`${step.id}: expected object response`);
  return errs;
}

async function main(): Promise<void> {
  const doc = JSON.parse(readFileSync(contractsPath, "utf8"));
  const steps: Step[] = doc.steps;
  let failed = 0;
  for (const step of steps) {
    const errs = await runStep(step);
    if (errs.length) {
      failed += 1;
      for (const e of errs) console.error(`FAIL ${e}`);
    } else {
      console.log(`ok   ${step.id}`);
    }
  }
  console.log(`${steps.length - failed}/${steps.length} contracts passed`);
  if (failed) process.exit(1);
}

main().catch((e) => {
  console.error(e);
  process.exit(1);
});
