/**
 * KektorDB-TPU TypeScript SDK.
 *
 * Reference surface: clients/typescript/src/client.ts (fetch-based client
 * mirroring the REST API). Field names match the server DTOs
 * (index_name, query_vector, relation_type, ...).
 */

import { KektorDBError, errorForStatus } from "./errors";
import type {
  CreateIndexOptions,
  EdgeInfo,
  IndexInfo,
  SearchHit,
  SearchOptions,
  SearchResponse,
  VectorItem,
} from "./types";

export { KektorDBError } from "./errors";
export type { EdgeInfo, IndexInfo, SearchHit, SearchOptions, VectorItem } from "./types";

export class Task {
  constructor(private client: KektorDBClient, public id: string) {}

  async status(): Promise<Record<string, unknown>> {
    return this.client.get(`/system/tasks/${this.id}`);
  }

  async wait(timeoutMs = 300_000, intervalMs = 250): Promise<Record<string, unknown>> {
    const deadline = Date.now() + timeoutMs;
    while (Date.now() < deadline) {
      const st = await this.status();
      if (st.status === "completed") return st;
      if (st.status === "failed") {
        throw new KektorDBError(500, String(st.error ?? "task failed"));
      }
      await new Promise((r) => setTimeout(r, intervalMs));
    }
    throw new Error(`task ${this.id} did not finish in ${timeoutMs}ms`);
  }
}

export class KektorDBClient {
  private headers: Record<string, string>;

  constructor(
    private baseUrl: string = "http://localhost:9091",
    token?: string,
  ) {
    this.baseUrl = baseUrl.replace(/\/$/, "");
    this.headers = { "Content-Type": "application/json" };
    if (token) this.headers["Authorization"] = `Bearer ${token}`;
  }

  private async req(method: string, path: string, body?: unknown): Promise<any> {
    const resp = await fetch(this.baseUrl + path, {
      method,
      headers: this.headers,
      body: body === undefined ? undefined : JSON.stringify(body),
    });
    if (resp.status === 204) return null;
    const text = await resp.text();
    let data: any = text;
    try {
      data = text ? JSON.parse(text) : null;
    } catch {
      /* binary/text body */
    }
    if (resp.status >= 400) {
      throw errorForStatus(resp.status, data?.error ?? text, data);
    }
    return data;
  }

  get(path: string): Promise<any> {
    return this.req("GET", path);
  }
  post(path: string, body?: unknown): Promise<any> {
    return this.req("POST", path, body);
  }

  // -- system ---------------------------------------------------------------

  health(): Promise<{ status: string }> {
    return this.get("/healthz");
  }
  stats(): Promise<any> {
    return this.get("/system/stats");
  }
  save(): Promise<any> {
    return this.post("/system/save");
  }
  aofRewrite(): Promise<any> {
    return this.post("/system/aof-rewrite");
  }

  // -- indexes --------------------------------------------------------------

  vcreate(indexName: string, opts: CreateIndexOptions = {}): Promise<any> {
    return this.post("/vector/actions/create", {
      index_name: indexName,
      metric: opts.metric ?? "euclidean",
      precision: opts.precision ?? "float32",
      m: opts.m ?? 16,
      ef_construction: opts.efConstruction ?? 200,
      ef_search: opts.efSearch ?? 100,
      text_language: opts.textLanguage ?? "english",
      shards: opts.shards ?? 0,
      kind: opts.kind ?? "hnsw",
      serve_mode: opts.serveMode ?? "auto",
      serve_proj_dim: opts.serveProjDim ?? 0,
      serve_proj_rerank: opts.serveProjRerank ?? 128,
    });
  }

  listIndexes(): Promise<IndexInfo[]> {
    return this.get("/vector/indexes");
  }
  indexInfo(name: string): Promise<IndexInfo> {
    return this.get(`/vector/indexes/${name}`);
  }
  dropIndex(name: string): Promise<null> {
    return this.req("DELETE", `/vector/indexes/${name}`);
  }
  configureIndex(name: string, config: Record<string, unknown>): Promise<any> {
    return this.post(`/vector/indexes/${name}/config`, config);
  }
  async triggerMaintenance(name: string, kind = "refine"): Promise<Task> {
    const out = await this.post(`/vector/indexes/${name}/maintenance`, { type: kind });
    return new Task(this, out.task_id);
  }
  exportVectors(name: string, limit = 100, offset = 0): Promise<any> {
    return this.get(`/vector/indexes/${name}/export?limit=${limit}&offset=${offset}`);
  }

  // -- vectors --------------------------------------------------------------

  vadd(
    indexName: string,
    id: string,
    vector: number[],
    metadata?: Record<string, unknown>,
  ): Promise<any> {
    return this.post("/vector/actions/add", {
      index_name: indexName,
      id,
      vector,
      metadata,
    });
  }

  vaddBatch(indexName: string, vectors: VectorItem[]): Promise<any> {
    return this.post("/vector/actions/add-batch", {
      index_name: indexName,
      vectors,
    });
  }

  async vimport(indexName: string, vectors: VectorItem[]): Promise<Task> {
    const out = await this.post("/vector/actions/import", {
      index_name: indexName,
      vectors,
    });
    return new Task(this, out.task_id);
  }

  /** queryVector=null with opts.textQuery runs a text-only (BM25) search. */
  vsearch(
    indexName: string,
    queryVector: number[] | null,
    k = 10,
    opts: SearchOptions = {},
  ): Promise<{ results: SearchHit[]; ids: string[] }> {
    return this.post("/vector/actions/search", {
      index_name: indexName,
      query_vector: queryVector ?? undefined,
      k,
      filter: opts.filter,
      text_query: opts.textQuery,
      alpha: opts.alpha,
      ef_search: opts.efSearch,
      graph_filter: opts.graphFilter,
      hydrate: opts.hydrate,
      hydrate_relations: opts.hydrateRelations,
    });
  }

  /** Batched search: [B, D] queries in one request → per-query hit lists. */
  async vsearchBatch(
    indexName: string,
    queryVectors: number[][],
    k = 10,
    opts: SearchOptions = {},
  ): Promise<SearchHit[][]> {
    const out = await this.post("/vector/actions/search", {
      index_name: indexName,
      query_vectors: queryVectors,
      k,
      filter: opts.filter,
      text_query: opts.textQuery,
      alpha: opts.alpha,
      ef_search: opts.efSearch,
      hydrate: opts.hydrate,
    });
    return out.results_batch;
  }

  /**
   * Columnar batched search: parallel ids/scores/distances [B][<=k]
   * arrays (~3x fewer wire bytes than per-hit dicts). Queries ship as
   * base64 raw little-endian f32 — no JSON float parsing server-side.
   */
  async vsearchBatchColumnar(
    indexName: string,
    queryVectors: number[][] | Float32Array,
    k = 10,
    opts: SearchOptions & { dim?: number; binaryResults?: boolean } = {},
  ): Promise<{
    ids: string[][];
    scores: number[][] | Float32Array;
    distances: (number | null)[][] | Float32Array;
    shape?: [number, number];
    metadata?: Record<string, unknown>[][];
  }> {
    let flat: Float32Array;
    let shape: [number, number];
    if (queryVectors instanceof Float32Array) {
      const d = opts.dim;
      if (!d) throw new Error("dim required with a flat Float32Array");
      flat = queryVectors;
      shape = [flat.length / d, d];
    } else {
      shape = [queryVectors.length, queryVectors[0]?.length ?? 0];
      flat = new Float32Array(shape[0] * shape[1]);
      queryVectors.forEach((q, i) => flat.set(q, i * shape[1]));
    }
    const bytes = new Uint8Array(flat.buffer, flat.byteOffset,
      flat.byteLength);
    let bin = "";
    const CHUNK = 0x8000;
    for (let i = 0; i < bytes.length; i += CHUNK) {
      bin += String.fromCharCode(...bytes.subarray(i, i + CHUNK));
    }
    const out = await this.post("/vector/actions/search", {
      index_name: indexName,
      query_vectors_b64: btoa(bin),
      query_shape: shape,
      columnar: true,
      wire: opts.binaryResults ? "b64" : undefined,
      k,
      filter: opts.filter,
      text_query: opts.textQuery,
      alpha: opts.alpha,
      ef_search: opts.efSearch,
      hydrate: opts.hydrate,
    });
    if (out.scores_b64) {
      // binary wire: decode base64 raw little-endian f32 [B, k] buffers
      // (server falls back to list columnar when results are ragged)
      const dec = (b64: string): Float32Array => {
        const s = atob(b64);
        const u = new Uint8Array(s.length);
        for (let i = 0; i < s.length; i++) u[i] = s.charCodeAt(i);
        return new Float32Array(u.buffer);
      };
      // ids ride the binary wire as one newline-joined UTF-8 blob
      // (server falls back to a JSON array for ids embedding a newline)
      let ids = out.ids;
      if (out.ids_b64 !== undefined) {
        const flat = new TextDecoder()
          .decode(Uint8Array.from(atob(out.ids_b64), (c) => c.charCodeAt(0)))
          .split("\n");
        const kk = out.shape[1];
        ids = Array.from({ length: out.shape[0] }, (_, i) =>
          flat.slice(i * kk, (i + 1) * kk),
        );
      }
      return {
        ids,
        scores: dec(out.scores_b64),
        distances: dec(out.distances_b64),
        shape: out.shape,
      };
    }
    return out;
  }

  vsearchWithScores(
    indexName: string,
    queryVector: number[],
    k = 10,
  ): Promise<SearchHit[]> {
    return this.post("/vector/actions/search-with-scores", {
      index_name: indexName,
      query_vector: queryVector,
      k,
    });
  }

  vdel(indexName: string, id: string): Promise<any> {
    return this.post("/vector/actions/delete_vector", {
      index_name: indexName,
      id,
    });
  }

  vget(indexName: string, id: string): Promise<VectorItem> {
    return this.get(`/vector/indexes/${indexName}/vectors/${id}`);
  }

  vgetBatch(indexName: string, ids: string[], compressContext = false): Promise<any[]> {
    return this.post("/vector/actions/get-vectors", {
      index_name: indexName,
      ids,
      compress_context: compressContext,
    });
  }

  vreinforce(indexName: string, ids: string[]): Promise<any> {
    return this.post("/vector/actions/reinforce", { index_name: indexName, ids });
  }

  vevolve(
    indexName: string,
    oldId: string,
    newVector: number[],
    opts: { newContent?: string; newMetadata?: Record<string, unknown>; reason?: string } = {},
  ): Promise<any> {
    return this.post("/vector/actions/evolve", {
      index_name: indexName,
      old_id: oldId,
      new_vector: newVector,
      new_content: opts.newContent,
      new_metadata: opts.newMetadata,
      reason: opts.reason,
    });
  }

  beliefState(indexName: string, id: string): Promise<any> {
    return this.post("/vector/actions/belief-assessment", {
      index_name: indexName,
      id,
    });
  }

  // -- graph ----------------------------------------------------------------

  vlink(
    indexName: string,
    sourceId: string,
    relationType: string,
    targetId: string,
    opts: { weight?: number; props?: Record<string, unknown>; inverseRelationType?: string } = {},
  ): Promise<any> {
    return this.post("/graph/actions/link", {
      index_name: indexName,
      source_id: sourceId,
      target_id: targetId,
      relation_type: relationType,
      weight: opts.weight,
      props: opts.props,
      inverse_relation_type: opts.inverseRelationType,
    });
  }

  vunlink(
    indexName: string,
    sourceId: string,
    relationType: string,
    targetId: string,
  ): Promise<any> {
    return this.post("/graph/actions/unlink", {
      index_name: indexName,
      source_id: sourceId,
      target_id: targetId,
      relation_type: relationType,
    });
  }

  getLinks(indexName: string, sourceId: string, relationType?: string): Promise<any> {
    return this.post("/graph/actions/get-links", {
      index_name: indexName,
      source_id: sourceId,
      relation_type: relationType,
    });
  }

  getIncoming(indexName: string, targetId: string, relationType?: string): Promise<any> {
    return this.post("/graph/actions/get-incoming", {
      index_name: indexName,
      target_id: targetId,
      relation_type: relationType,
    });
  }

  traverse(indexName: string, startId: string, path: string): Promise<any> {
    return this.post("/graph/actions/traverse", {
      index_name: indexName,
      start_id: startId,
      path,
    });
  }

  extractSubgraph(
    indexName: string,
    rootId: string,
    maxDepth = 2,
    relations: string[] = [],
  ): Promise<any> {
    return this.post("/graph/actions/extract-subgraph", {
      index_name: indexName,
      root_id: rootId,
      max_depth: maxDepth,
      relations,
    });
  }

  findPath(indexName: string, sourceId: string, targetId: string): Promise<any> {
    return this.post("/graph/actions/find-path", {
      index_name: indexName,
      source_id: sourceId,
      target_id: targetId,
    });
  }

  searchNodes(indexName: string, propertyFilter?: string, limit = 100): Promise<any> {
    return this.post("/graph/actions/search-nodes", {
      index_name: indexName,
      property_filter: propertyFilter,
      limit,
    });
  }

  // -- kv -------------------------------------------------------------------

  async kvSet(key: string, value: string): Promise<void> {
    const resp = await fetch(`${this.baseUrl}/kv/${key}`, {
      method: "POST",
      headers: this.headers,
      body: value,
    });
    if (!resp.ok) throw new KektorDBError(resp.status, await resp.text());
  }

  async kvGet(key: string): Promise<string> {
    const resp = await fetch(`${this.baseUrl}/kv/${key}`, { headers: this.headers });
    if (!resp.ok) throw new KektorDBError(resp.status, await resp.text());
    return resp.text();
  }

  kvDelete(key: string): Promise<any> {
    return this.req("DELETE", `/kv/${key}`);
  }

  // -- rag / sessions / transfer -------------------------------------------

  ragRetrieve(pipelineName: string, query: string, k = 10): Promise<any> {
    return this.post("/rag/retrieve", { pipeline_name: pipelineName, query, k });
  }

  ragRetrieveAdaptive(pipelineName: string, query: string, tokenBudget = 2000): Promise<any> {
    return this.post("/rag/retrieve-adaptive", {
      pipeline_name: pipelineName,
      query,
      token_budget: tokenBudget,
    });
  }

  async startSession(userId?: string): Promise<string> {
    const out = await this.post("/sessions", { user_id: userId });
    return out.session_id;
  }

  endSession(sessionId: string): Promise<any> {
    return this.post(`/sessions/${sessionId}/end`);
  }

  transferMemory(sourceIndex: string, targetIndex: string, filter?: string): Promise<any> {
    return this.post("/transfer/memory", {
      source_index: sourceIndex,
      target_index: targetIndex,
      filter,
    });
  }

  // -- auth -----------------------------------------------------------------

  createApiKey(role: string, namespaces?: string[], name = ""): Promise<any> {
    return this.post("/auth/keys", { role, namespaces, name });
  }
  listApiKeys(): Promise<any> {
    return this.get("/auth/keys");
  }
  revokeApiKey(id: string): Promise<any> {
    return this.req("DELETE", `/auth/keys/${id}`);
  }
}
