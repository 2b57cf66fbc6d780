/**
 * Cognitive session helper (reference: clients/typescript/src/cognitive.ts).
 */

import { KektorDBClient, SearchHit } from "./client";

export class CognitiveSession {
  public sessionId: string | null = null;
  private saved: string[] = [];

  constructor(
    private client: KektorDBClient,
    private index = "mcp_memory",
    private userId?: string,
    private embed?: (text: string) => Promise<number[]>,
  ) {}

  async start(): Promise<string> {
    this.sessionId = await this.client.startSession(this.userId);
    return this.sessionId;
  }

  private async vector(text: string): Promise<number[]> {
    if (this.embed) return this.embed(text);
    // deterministic signed feature hashing, mirrors the server default
    const dim = 384;
    const out = new Array<number>(dim).fill(0);
    const words = text.toLowerCase().split(/\s+/).filter(Boolean);
    const grams = [...words];
    for (let i = 0; i + 1 < words.length; i++) grams.push(`${words[i]} ${words[i + 1]}`);
    for (const g of grams) {
      let h = 2166136261;
      for (let i = 0; i < g.length; i++) {
        h ^= g.charCodeAt(i);
        h = Math.imul(h, 16777619);
      }
      const slot = Math.abs(h) % dim;
      out[slot] += h & 1 ? 1 : -1;
    }
    const norm = Math.sqrt(out.reduce((a, v) => a + v * v, 0)) || 1;
    return out.map((v) => v / norm);
  }

  async remember(content: string, metadata: Record<string, unknown> = {}): Promise<string> {
    if (!this.sessionId) await this.start();
    const id = `mem_${Math.random().toString(36).slice(2, 14)}`;
    try {
      await this.client.indexInfo(this.index);
    } catch {
      await this.client.vcreate(this.index, { metric: "cosine" });
    }
    await this.client.vadd(this.index, id, await this.vector(content), {
      ...metadata,
      content,
      session_id: this.sessionId,
      user_id: this.userId,
      _indexed_fields: ["content"],
    });
    this.saved.push(id);
    return id;
  }

  async recall(query: string, k = 5, sessionOnly = false): Promise<SearchHit[]> {
    const filter = sessionOnly && this.sessionId ? `session_id = ${this.sessionId}` : undefined;
    const out = await this.client.vsearch(this.index, await this.vector(query), k, {
      filter,
      textQuery: query,
      hydrate: true,
    });
    return out.results;
  }

  async assembleContext(query: string, tokenBudget = 2000): Promise<string> {
    const hits = await this.recall(query, 20);
    const parts: string[] = [];
    let used = 0;
    for (const h of hits) {
      const content = String((h.metadata as any)?.content ?? "");
      const t = Math.max(Math.floor(content.length / 4), 1);
      if (used + t > tokenBudget && parts.length) break;
      used += t;
      parts.push(content);
    }
    return parts.join("\n\n");
  }

  async end(): Promise<void> {
    if (this.sessionId) await this.client.endSession(this.sessionId);
    this.sessionId = null;
  }
}

/**
 * Adaptive context assembly over the graph-aware retrieval endpoints
 * (reference: pkg/client/cognitive/adaptive.go behavior — seed search,
 * graph expansion, token-budgeted assembly with provenance).
 */
export class ContextAssembler {
  private session: CognitiveSession | null = null;

  constructor(
    private client: KektorDBClient,
    private index = "mcp_memory",
    private embed?: (text: string) => Promise<number[]>,
  ) {}

  async assemble(
    query: string,
    opts: { tokenBudget?: number; k?: number; expandDepth?: number } = {},
  ): Promise<{ context: string; sources: SearchHit[] }> {
    if (!this.session) this.session = new CognitiveSession(this.client, this.index);
    const budget = opts.tokenBudget ?? 2000;
    const k = opts.k ?? 10;
    const vec = await (this.embed
      ? this.embed(query)
      : (this.session as any).vector(query));
    const seed = await this.client.vsearch(this.index, vec, k, {
      textQuery: query,
      hydrate: true,
      hydrateRelations: (opts.expandDepth ?? 1) > 0,
    });
    const parts: string[] = [];
    const sources: SearchHit[] = [];
    let used = 0;
    for (const h of seed.results) {
      const content = String((h.metadata as any)?.content ?? "");
      if (!content) continue;
      const t = Math.max(Math.floor(content.length / 4), 1);
      if (used + t > budget && parts.length) break;
      used += t;
      parts.push(`[${h.id}] ${content}`);
      sources.push(h);
    }
    return { context: parts.join("\n\n"), sources };
  }
}

export type AgentFn = (
  input: string,
  shared: Record<string, unknown>,
) => Promise<string>;

/**
 * Multi-agent coordination with shared memory in KektorDB (reference:
 * pkg/client/cognitive/multi_agent.go behavior — register agents, run them
 * as a pipeline or in parallel, share state through the KV store).
 */
export class MultiAgentCoordinator {
  private agents = new Map<string, AgentFn>();

  constructor(
    private client: KektorDBClient,
    private namespace = "agents",
  ) {}

  register(name: string, fn: AgentFn): void {
    this.agents.set(name, fn);
  }

  async setShared(key: string, value: unknown): Promise<void> {
    await this.client.kvSet(
      `${this.namespace}:shared:${key}`,
      JSON.stringify(value),
    );
  }

  async getShared<T = unknown>(key: string): Promise<T | null> {
    try {
      const raw = await this.client.kvGet(`${this.namespace}:shared:${key}`);
      return JSON.parse(raw) as T;
    } catch {
      return null;
    }
  }

  /** Run agents sequentially; each output feeds the next input. */
  async pipeline(names: string[], input: string): Promise<string> {
    let cur = input;
    const shared: Record<string, unknown> = {};
    for (const n of names) {
      const fn = this.agents.get(n);
      if (!fn) throw new Error(`unknown agent: ${n}`);
      cur = await fn(cur, shared);
      await this.setShared(`last:${n}`, cur);
    }
    return cur;
  }

  /** Run agents concurrently on the same input. */
  async parallel(names: string[], input: string): Promise<Record<string, string>> {
    const shared: Record<string, unknown> = {};
    const entries = await Promise.all(
      names.map(async (n) => {
        const fn = this.agents.get(n);
        if (!fn) throw new Error(`unknown agent: ${n}`);
        return [n, await fn(input, shared)] as const;
      }),
    );
    return Object.fromEntries(entries);
  }
}
